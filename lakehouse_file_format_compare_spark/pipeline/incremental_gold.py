"""Incremental gold maintenance — the 100 TB replacement for the
reference's full-refresh gold (DROP + recreate every cycle,
dags/3_silver_to_gold.py:188; SURVEY §7.3 explicitly flags this as
the scale fix).

At 100 TB, recomputing monthly_balance over all history per cycle is
O(history); maintaining it from the new micro-batch's transactions is
O(batch). monthly_balance is distributive-aggregate-only
(SUM/COUNT/MAX, with AVG derived as sum/count), so append-only deltas
fold in exactly:

    combined = full_outer_join(gold, delta_gold, group_keys)
               sums/counts add, maxes take greatest, avg recomputed

Validity: the plain folds are correct for APPEND-ONLY facts. The
fintech pipeline's f_transactions PKs are unique per batch
(batch-epoch-micros + i), so silver merges are pure inserts and the
precondition holds. When an updating merge DOES slip rows under the
folded PK horizon, the ``*_with_updates`` variants (r5) handle it
incrementally: appends still fold arithmetically, while the state
rows/groups touched by an updated row's old or new image are
recomputed from current silver (time travel supplies the old image)
and spliced in — O(batch + affected-key history), never O(history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gold import _completed_ts, contract_financials, financial_txns, monthly_balance

GROUP_KEYS = ("ano", "mes", "contract_id")


class AppendOnlyViolation(RuntimeError):
    """The incremental-fold precondition (delta rows are NEW facts,
    never updates of already-folded rows) does not hold; folding would
    silently double-count. Callers fall back to full refresh."""


def check_append_only(
    delta: DataFrame, max_seen_pk: int | None, pk_col: str = "transaction_id"
) -> None:
    """Runtime guard for the append-only precondition.

    Transaction PKs are monotone (batch-epoch-micros + i,
    generate.py:283), so "every delta PK is unseen" reduces to
    ``min(delta.pk) > max PK folded so far`` — one O(batch) scalar
    aggregate, no join against history. An UPDATED row keeps its old
    (smaller) PK while its bumped ingestion_timestamp lands it in the
    watermark delta, so updates are exactly what this catches.
    """
    if max_seen_pk is None:
        return
    mn = delta.agg(F.min(pk_col)).collect()[0][0]
    if mn is not None and mn <= max_seen_pk:
        raise AppendOnlyViolation(
            f"delta contains {pk_col} {mn} <= already-folded max {max_seen_pk}: "
            "not append-only (updated or replayed rows); use full refresh"
        )


def _add(col: str) -> F.Column:
    return (F.coalesce(F.col(f"g.{col}"), F.lit(0.0)) + F.coalesce(F.col(f"d.{col}"), F.lit(0.0))).alias(col)


def incremental_monthly_balance(
    existing_gold: DataFrame,
    delta_transactions: DataFrame,
    d_transaction_types: DataFrame,
) -> DataFrame:
    """Fold an append-only transaction delta into the existing
    monthly_balance table. Only the delta is aggregated; the join
    touches existing groups only where the delta has rows (at scale:
    partition-pruned by (ano, mes) — the gold partition spec,
    3_…py:193)."""
    delta_gold = monthly_balance(delta_transactions, d_transaction_types)
    g = existing_gold.alias("g")
    d = delta_gold.alias("d")
    joined = g.join(d, on=list(GROUP_KEYS), how="full_outer")
    total = (
        F.coalesce(F.col("g.total_transacoes"), F.lit(0))
        + F.coalesce(F.col("d.total_transacoes"), F.lit(0))
    )
    saldo = (
        F.coalesce(F.col("g.saldo_liquido"), F.lit(0.0))
        + F.coalesce(F.col("d.saldo_liquido"), F.lit(0.0))
    )
    return joined.select(
        *GROUP_KEYS,
        _add("entradas"),
        _add("saidas"),
        saldo.alias("saldo_liquido"),
        total.alias("total_transacoes"),
        # AVG is algebraic: derivable from the maintained sums
        (saldo / total).alias("valor_medio_transacao"),
        # maior_entrada/maior_saida are MAX/MIN(amount) (signed, can be
        # negative/positive respectively) — greatest/least skip NULLs in
        # Spark, so a group present on only one side keeps its own value.
        F.greatest(F.col("g.maior_entrada"), F.col("d.maior_entrada")).alias("maior_entrada"),
        F.least(F.col("g.maior_saida"), F.col("d.maior_saida")).alias("maior_saida"),
    )


def _group_keys_of(txns: DataFrame, d_transaction_types: DataFrame) -> DataFrame:
    """Distinct (ano, mes, contract_id) gold groups a set of
    transaction rows lands in (financial filter applied — only rows
    monthly_balance would actually count)."""
    ts = _completed_ts()
    return (
        financial_txns(txns, d_transaction_types)
        .select(
            F.year(ts).alias("ano"),
            F.month(ts).alias("mes"),
            "contract_id",
        )
        .distinct()
    )


def incremental_monthly_balance_with_updates(
    existing_gold: DataFrame,
    delta: DataFrame,
    max_seen_pk: int | None,
    silver_old: DataFrame,
    silver_current: DataFrame,
    d_transaction_types: DataFrame,
    pk_col: str = "transaction_id",
) -> DataFrame:
    """Retraction-capable fold (r4 verdict #6): handles a delta that
    CONTAINS UPDATES of already-folded rows without falling back to a
    full O(history) refresh.

    Split the watermark delta on the folded PK horizon: rows with
    pk > max_seen_pk are genuine appends and fold arithmetically
    (``incremental_monthly_balance``). Rows with pk <= max_seen_pk are
    updates; their OLD images come from the pre-merge silver snapshot
    (time travel on the versioned store). SUM/COUNT would subtract
    cleanly, but maior_entrada/maior_saida are MAX/MIN — not
    retractable from the output row alone — so the AFFECTED GOLD
    GROUPS (the distinct (ano, mes, contract_id) keys of the old AND
    new images — both, because an updated completed-timestamp moves a
    row between months) are recomputed from current silver restricted
    to those keys and swapped in wholesale. Exactness: recomputation
    is ground truth for the affected groups; untouched groups keep
    their folded values bit-for-bit.

    Scale: O(new batch) for the append fold + O(affected-group
    history) for the repair. Updates are rare and touch few groups, so
    the group-key set is broadcast and the repair scan is
    partition-prunable on (ano, mes) — never O(history). (A
    pathological batch updating most of history degrades gracefully
    toward full-refresh cost, which is exactly the right asymptote.)
    """
    pk = F.col(pk_col)
    if max_seen_pk is None:
        new_rows, upd_new = delta, delta.where(F.lit(False))
    else:
        new_rows = delta.where(pk > max_seen_pk)
        upd_new = delta.where(pk <= max_seen_pk)
    folded = incremental_monthly_balance(existing_gold, new_rows, d_transaction_types)

    upd_old = silver_old.join(
        upd_new.select(pk_col).distinct(), pk_col, "left_semi"
    )
    groups = (
        _group_keys_of(upd_new, d_transaction_types)
        .unionByName(_group_keys_of(upd_old, d_transaction_types))
        .distinct()
    )
    # All current-silver rows landing in an affected group. Group keys
    # are computable pre-join (ano/mes from the completed ts,
    # contract_id on the fact), so the semi-join prunes BEFORE the
    # dimension join and monthly_balance recomputes only those groups.
    ts = _completed_ts()
    affected_raw = (
        silver_current.withColumn("ano", F.year(ts)).withColumn("mes", F.month(ts))
        .join(F.broadcast(groups), ["ano", "mes", "contract_id"], "left_semi")
        .drop("ano", "mes")
    )
    recomputed = monthly_balance(affected_raw, d_transaction_types)
    return (
        folded.join(F.broadcast(groups), list(GROUP_KEYS), "left_anti")
        .unionByName(recomputed)
    )


# ---------------------------------------------------------------------------
# Q3 daily_transaction_metrics — partial-state maintenance
# ---------------------------------------------------------------------------
# The Q3 aggregates are not all distributive over the GOLD grain:
# COUNT(DISTINCT contract_id) and STDDEV need more than the output row
# to fold a delta in. The state table therefore lives ONE level finer —
# (data_transacao, transaction_type_name, is_financial, contract_id) —
# holding the distributive partials (n, sum, sum-of-squares, min, max).
# At that grain everything folds by addition/extrema, the distinct
# contract count is exactly the state row count per gold group, and
# sample stddev derives from (n, s, ssq). State size is bounded by
# days x types x contracts — orders of magnitude below the transaction
# count the full refresh rescans (reference: 3_silver_to_gold.py:188).

DAILY_STATE_KEYS = ("data_transacao", "transaction_type_name", "is_financial", "contract_id")


def daily_metrics_state(
    f_transactions: DataFrame, d_transaction_types: DataFrame
) -> DataFrame:
    """Distributive partials of Q3 at (gold grain x contract)."""
    amt = F.col("amount")
    return (
        financial_txns(f_transactions, d_transaction_types)
        .groupBy(
            F.to_date(_completed_ts()).alias("data_transacao"),
            F.col("transaction_type_name"),
            F.col("is_financial"),
            F.col("contract_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(amt).alias("s"),
            F.sum(amt * amt).alias("ssq"),
            F.min(amt).alias("mn"),
            F.max(amt).alias("mx"),
        )
    )


def incremental_daily_metrics_state(
    state: DataFrame, delta_transactions: DataFrame, d_transaction_types: DataFrame
) -> DataFrame:
    """Fold an append-only transaction delta into the Q3 state: sums
    and counts add, extrema take least/greatest (NULL-skipping, so a
    key present on only one side keeps its own value)."""
    d = daily_metrics_state(delta_transactions, d_transaction_types)
    g = state.alias("g")
    joined = g.join(d.alias("d"), on=list(DAILY_STATE_KEYS), how="full_outer")

    def _sum(col, zero):
        return (
            F.coalesce(F.col(f"g.{col}"), F.lit(zero))
            + F.coalesce(F.col(f"d.{col}"), F.lit(zero))
        ).alias(col)

    return joined.select(
        *DAILY_STATE_KEYS,
        _sum("n", 0),
        _sum("s", 0.0),
        _sum("ssq", 0.0),
        F.least(F.col("g.mn"), F.col("d.mn")).alias("mn"),
        F.greatest(F.col("g.mx"), F.col("d.mx")).alias("mx"),
    )


def daily_transaction_metrics_from_state(
    state: DataFrame, with_created_at: bool = False
) -> DataFrame:
    """Q3 serving rollup from the maintained state — O(state), never
    O(transactions). desvio_padrao uses the sum-of-squares identity
    var = (ssq - s^2/n)/(n-1), clamped at 0 against fp cancellation;
    NULL for n=1 groups (Spark's stddev_samp and DuckDB's stddev agree
    on NULL there). contratos_unicos = COUNT(*) of state rows: the
    state grain makes the distinct count exact, no sketch needed."""
    n, s, ssq = F.col("_n"), F.col("_s"), F.col("_ssq")
    var = (ssq - (s * s) / n) / (n - F.lit(1))
    out = (
        state.groupBy("data_transacao", "transaction_type_name", "is_financial")
        .agg(
            F.sum("n").alias("_n"),
            F.sum("s").alias("_s"),
            F.sum("ssq").alias("_ssq"),
            F.min("mn").alias("valor_minimo"),
            F.max("mx").alias("valor_maximo"),
            F.count(F.lit(1)).alias("contratos_unicos"),
        )
        .select(
            "data_transacao",
            "transaction_type_name",
            "is_financial",
            n.alias("quantidade_transacoes"),
            s.alias("volume_total"),
            (s / n).alias("valor_medio"),
            F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).alias("desvio_padrao"),
            "valor_minimo",
            "valor_maximo",
            "contratos_unicos",
        )
    )
    if with_created_at:
        out = out.withColumn("created_at", F.current_timestamp())
    return out


# ---------------------------------------------------------------------------
# Q2 customer_summary — contract-grain state + O(dims) serving
# ---------------------------------------------------------------------------
# Q2's only O(transactions) input is the per-contract financial rollup
# (3_…py:245-257); everything above it joins dimensions. The state is
# therefore exactly that rollup (gold.contract_financials), folded
# O(batch); the serving rollup (gold.customer_summary_from_contract_state)
# recomputes the customer grouping from current dims + state —
# O(contracts + dims) per cycle. The sorted COLLECT_SET folds as
# set-union implicitly: it is re-collected from the dims at serving,
# which is both cheaper and immune to product re-categorization.


def incremental_contract_financials(
    state: DataFrame, delta_transactions: DataFrame, d_transaction_types: DataFrame
) -> DataFrame:
    """Fold an append-only transaction delta into the per-contract
    financial state: saldo/count add, last-activity takes greatest."""
    d = contract_financials(delta_transactions, d_transaction_types)
    g = state.alias("g")
    joined = g.join(d.alias("d"), on="contract_id", how="full_outer")
    return joined.select(
        "contract_id",
        (
            F.coalesce(F.col("g.saldo_contrato"), F.lit(0.0))
            + F.coalesce(F.col("d.saldo_contrato"), F.lit(0.0))
        ).alias("saldo_contrato"),
        (
            F.coalesce(F.col("g.txns_contrato"), F.lit(0))
            + F.coalesce(F.col("d.txns_contrato"), F.lit(0))
        ).alias("txns_contrato"),
        F.greatest(
            F.col("g.ultima_atividade_contrato"), F.col("d.ultima_atividade_contrato")
        ).alias("ultima_atividade_contrato"),
    )


def _split_delta(delta: DataFrame, max_seen_pk: int | None, pk_col: str):
    pk = F.col(pk_col)
    if max_seen_pk is None:
        return delta, delta.where(F.lit(False))
    return delta.where(pk > max_seen_pk), delta.where(pk <= max_seen_pk)


def _date_contract_keys(txns: DataFrame, d_transaction_types: DataFrame) -> DataFrame:
    """Distinct (data_transacao, contract_id) keys a set of transaction
    rows lands in under the Q3 state grain (financial filter applied)."""
    return (
        financial_txns(txns, d_transaction_types)
        .select(
            F.to_date(_completed_ts()).alias("data_transacao"),
            "contract_id",
        )
        .distinct()
    )


def incremental_daily_metrics_state_with_updates(
    state: DataFrame,
    delta: DataFrame,
    max_seen_pk: int | None,
    silver_old: DataFrame,
    silver_current: DataFrame,
    d_transaction_types: DataFrame,
    pk_col: str = "transaction_id",
) -> DataFrame:
    """Retraction-capable Q3 state fold: appends fold arithmetically;
    updated rows invalidate their (data_transacao, contract_id) key
    pairs — old AND new images, since an updated completed timestamp
    moves a row across days — and every state cell under those pairs
    is recomputed from current silver and spliced in. The pair grain
    is deliberately COARSER than the 4-column state grain: it is
    derivable from the fact row alone (no dimension join needed for
    the invalidation set), and recomputing a few extra type-cells for
    a touched (day, contract) is O(that day's transactions), not
    O(history)."""
    new_rows, upd_new = _split_delta(delta, max_seen_pk, pk_col)
    folded = incremental_daily_metrics_state(state, new_rows, d_transaction_types)
    upd_old = silver_old.join(upd_new.select(pk_col).distinct(), pk_col, "left_semi")
    keys = (
        _date_contract_keys(upd_new, d_transaction_types)
        .unionByName(_date_contract_keys(upd_old, d_transaction_types))
        .distinct()
    )
    affected_raw = (
        silver_current.withColumn("data_transacao", F.to_date(_completed_ts()))
        .join(F.broadcast(keys), ["data_transacao", "contract_id"], "left_semi")
        .drop("data_transacao")
    )
    recomputed = daily_metrics_state(affected_raw, d_transaction_types)
    return (
        folded.join(F.broadcast(keys), ["data_transacao", "contract_id"], "left_anti")
        .unionByName(recomputed)
    )


def incremental_contract_financials_with_updates(
    state: DataFrame,
    delta: DataFrame,
    max_seen_pk: int | None,
    silver_old: DataFrame,
    silver_current: DataFrame,
    d_transaction_types: DataFrame,
    pk_col: str = "transaction_id",
) -> DataFrame:
    """Retraction-capable Q2/Q4 contract-state fold: appends fold
    arithmetically; contracts touched by an updated row (old or new
    image — contract reassignment moves a row between contracts) are
    recomputed from current silver and spliced in. O(batch +
    affected-contract history)."""
    new_rows, upd_new = _split_delta(delta, max_seen_pk, pk_col)
    folded = incremental_contract_financials(state, new_rows, d_transaction_types)
    upd_old = silver_old.join(upd_new.select(pk_col).distinct(), pk_col, "left_semi")
    keys = (
        upd_new.select("contract_id")
        .unionByName(upd_old.select("contract_id"))
        .distinct()
    )
    affected_raw = silver_current.join(F.broadcast(keys), "contract_id", "left_semi")
    recomputed = contract_financials(affected_raw, d_transaction_types)
    return (
        folded.join(F.broadcast(keys), "contract_id", "left_anti")
        .unionByName(recomputed)
    )
