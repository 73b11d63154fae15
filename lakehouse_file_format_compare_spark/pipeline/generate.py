"""Deterministic bronze generator for the 15-table fintech star schema.

Replaces the reference's Faker/wall-clock generator
(dags/1_generate_bronze_batch.py:134-495) with a seeded, frozen-clock
equivalent: same tables, same distributions (FIXTURES.md), fully
reproducible. Key fixes over the reference (SURVEY §4 anti-patterns):

- ``random.Random(seed)`` + frozen ``now`` instead of unseeded Faker
  and import-time ``random.randint`` (1_…py:26-29).
- ID continuity via in-process ``GeneratorState`` instead of
  re-reading every prior CSV batch and collect()ing PK columns to the
  driver (1_…py:279-284, 338-345).
- The reference's PK-collision quirks are PRESERVED on purpose
  (identifier_id and attribute_id restart at 1 every batch —
  1_…py:306, 388 — so upserts overwrite; FIXTURES.md documents them).

All rows are built driver-side then parallelized with explicit
schemas — correct for the reference's bronze scale (hundreds to
thousands of rows per 10-min batch). A 100 TB synthetic load would
instead use ``spark.range(n)`` + column expressions; see
tests/test_scale_generate.py for that pattern.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field
from random import Random

from pyspark.sql import DataFrame, SparkSession

from ..schemas import FINTECH_SCHEMAS

EPOCH_UTC = dt.timezone.utc

COUNTRIES = ["Brasil", "Argentina", "Chile", "Colombia"]
STATES = ["São Paulo", "Rio de Janeiro", "Minas Gerais", "Bahia", "Paraná",
          "Rio Grande do Sul", "Pernambuco", "Ceará"]
CITIES = ["São Paulo", "Campinas", "Rio de Janeiro", "Niterói", "Belo Horizonte",
          "Salvador", "Curitiba", "Porto Alegre", "Recife", "Fortaleza", "Santos"]
PRODUCTS = [
    ("NuCard Credit", "Credit"), ("NuCard Debit", "Banking"),
    ("NuConta", "Banking"), ("NuInvest", "Investment"),
    ("NuRewards", "Rewards"), ("NuInsurance Life", "Insurance"),
    ("NuInsurance Mobile", "Insurance"), ("NuLoan Personal", "Credit"),
]
TRANSACTION_TYPES = [
    (101, "CREDIT_PURCHASE", True), (102, "DEBIT_PURCHASE", True),
    (103, "PIX_SENT", True), (104, "PIX_RECEIVED", True),
    (105, "INVESTMENT_BUY", True), (106, "INVESTMENT_SELL", True),
    (107, "LOAN_PAYMENT", True), (108, "TRANSFER_OUT", True),
    (109, "TRANSFER_IN", True), (110, "BILL_PAYMENT", True),
    (201, "UPDATE_EMAIL", False), (202, "UPDATE_PHONE", False),
    (203, "UPDATE_ADDRESS", False), (204, "PASSWORD_RESET", False),
    (205, "LOGIN", False),
]
MONTH_NAMES = ["Janeiro", "Fevereiro", "Março", "Abril", "Maio", "Junho",
               "Julho", "Agosto", "Setembro", "Outubro", "Novembro", "Dezembro"]
WEEKDAY_NAMES = ["Segunda-feira", "Terça-feira", "Quarta-feira", "Quinta-feira",
                 "Sexta-feira", "Sábado", "Domingo"]
FIRST_NAMES = ["Ana", "Bruno", "Carla", "Diego", "Elena", "Felipe", "Gabriela",
               "Heitor", "Isabela", "João", "Karina", "Lucas", "Mariana",
               "Nicolas", "Olivia", "Pedro", "Rafaela", "Thiago"]
LAST_NAMES = ["Silva", "Santos", "Oliveira", "Souza", "Lima", "Pereira",
              "Costa", "Carvalho", "Almeida", "Nascimento", "Ferreira", "Araujo"]
ATTRIBUTE_NAMES = ["credit_limit", "interest_rate", "annual_fee", "reward_points",
                   "minimum_balance", "overdraft_limit", "insurance_coverage",
                   "monthly_fee", "transaction_limit", "daily_limit"]
CONTRACT_STATUS = [("ACTIVE", 0.70), ("BLOCKED", 0.15), ("CANCELLED", 0.10), ("PENDING", 0.05)]
TXN_STATUS = [("COMPLETED", 0.85), ("PENDING", 0.08), ("FAILED", 0.05), ("CANCELLED", 0.02)]


def _weighted(rng: Random, choices: list[tuple[str, float]]) -> str:
    x = rng.random()
    acc = 0.0
    for value, p in choices:
        acc += p
        if x < acc:
            return value
    return choices[-1][0]


@dataclass
class GeneratorState:
    """Cross-batch ID continuity (replaces the reference's CSV
    re-reads, 1_…py:279-284): customer_id and contract_id continue;
    identifier_id / attribute_id intentionally restart per batch."""

    seed: int = 42
    now: dt.datetime = field(
        default_factory=lambda: dt.datetime(2025, 7, 25, 12, 0, 0, tzinfo=EPOCH_UTC)
    )
    next_customer_id: int = 1
    next_contract_id: int = 1
    batch_index: int = 0
    known_customer_ids: list[int] = field(default_factory=list)
    known_contract_ids: list[int] = field(default_factory=list)


def generate_batch(
    state: GeneratorState,
    n_customers: int = 300,
    n_contracts: int = 500,
    n_transactions: int = 3000,
    n_attributes: int = 750,
) -> dict[str, list[dict]]:
    """One bronze micro-batch: all 15 tables as lists of dicts.
    Static dims are re-emitted every batch (the reference regenerates
    them each run and relies on insert-only merge, 1_…py:225-247)."""
    state.batch_index += 1
    rng = Random(state.seed * 1_000_003 + state.batch_index)
    now = state.now + dt.timedelta(minutes=10 * (state.batch_index - 1))
    ingest = now

    def ts_between(start: dt.datetime, end: dt.datetime) -> dt.datetime:
        delta = (end - start).total_seconds()
        return start + dt.timedelta(seconds=rng.uniform(0, delta))

    out: dict[str, list[dict]] = {}
    out["d_country"] = [
        {"country_id": i + 1, "country_name": c, "ingestion_timestamp": ingest}
        for i, c in enumerate(COUNTRIES)
    ]
    out["d_state"] = [
        {"state_id": i + 1, "state_name": s, "country_id": 1, "ingestion_timestamp": ingest}
        for i, s in enumerate(STATES)
    ]
    out["d_city"] = [
        {"city_id": i + 1, "city_name": c, "state_id": (i % len(STATES)) + 1,
         "ingestion_timestamp": ingest}
        for i, c in enumerate(CITIES)
    ]
    out["d_year"] = [
        {"year_id": y, "action_year": y, "ingestion_timestamp": ingest}
        for y in range(2020, 2031)
    ]
    out["d_month"] = [
        {"month_id": m, "action_month": m, "month_name": MONTH_NAMES[m - 1],
         "ingestion_timestamp": ingest}
        for m in range(1, 13)
    ]
    out["d_week"] = [
        {"week_id": w, "action_week": w, "ingestion_timestamp": ingest} for w in range(1, 54)
    ]
    out["d_weekday"] = [
        {"weekday_id": d, "action_weekday": WEEKDAY_NAMES[d - 1], "ingestion_timestamp": ingest}
        for d in range(1, 8)
    ]
    # 30-day rolling window of day rows (1_…py:249-271)
    out["d_time"] = []
    for back in range(30):
        day = (now - dt.timedelta(days=back)).replace(
            hour=0, minute=0, second=0, microsecond=0
        )
        iso = day.isocalendar()
        out["d_time"].append({
            "time_id": int(day.timestamp()),
            "full_timestamp": day,
            "year_id": day.year,
            "month_id": day.month,
            "week_id": iso.week,
            "weekday_id": iso.weekday,
            "ingestion_timestamp": ingest,
        })
    out["d_products"] = [
        {"product_id": i + 1, "product_name": n, "product_category": c,
         "ingestion_timestamp": ingest}
        for i, (n, c) in enumerate(PRODUCTS)
    ]
    out["d_transaction_types"] = [
        {"transaction_type_id": tid, "transaction_type_name": name,
         "is_financial": fin, "ingestion_timestamp": ingest}
        for tid, name, fin in TRANSACTION_TYPES
    ]

    customers = []
    for _ in range(n_customers):
        cid = state.next_customer_id
        state.next_customer_id += 1
        state.known_customer_ids.append(cid)
        customers.append({
            "customer_id": cid,
            "first_name": rng.choice(FIRST_NAMES),
            "last_name": rng.choice(LAST_NAMES),
            "ingestion_timestamp": ingest,
        })
    out["d_customers"] = customers

    identifiers = []
    ident_id = 1  # restarts every batch (reference quirk, 1_…py:306)
    for c in customers:
        identifiers.append({
            "identifier_id": ident_id,
            "customer_id": c["customer_id"],
            "identifier_type": "CPF",
            "identifier_value": f"{rng.randint(100, 999)}.{rng.randint(100, 999)}."
                                f"{rng.randint(100, 999)}-{rng.randint(10, 99)}",
            "country_id": 1,
            "ingestion_timestamp": ingest,
        })
        ident_id += 1
        if rng.random() < 0.7:
            identifiers.append({
                "identifier_id": ident_id,
                "customer_id": c["customer_id"],
                "identifier_type": "RG",
                "identifier_value": f"{rng.randint(10, 99)}.{rng.randint(100, 999)}."
                                    f"{rng.randint(100, 999)}-{rng.randint(0, 9)}",
                "country_id": 1,
                "ingestion_timestamp": ingest,
            })
            ident_id += 1
    out["d_customer_identifiers"] = identifiers

    contracts = []
    new_contract_ids = []
    for _ in range(n_contracts):
        kid = state.next_contract_id
        state.next_contract_id += 1
        state.known_contract_ids.append(kid)
        new_contract_ids.append(kid)
        start = ts_between(now - dt.timedelta(days=730), now)
        end = None
        if rng.random() >= 0.9:
            end = start + dt.timedelta(days=rng.randint(365, 1825))
        contracts.append({
            "contract_id": kid,
            "customer_id": rng.choice(state.known_customer_ids),
            "product_id": rng.randint(1, len(PRODUCTS)),
            "contract_status": _weighted(rng, CONTRACT_STATUS),
            "start_date": start,
            "end_date": end,
            "ingestion_timestamp": ingest,
        })
    out["f_contracts"] = contracts

    attributes = []
    for i in range(n_attributes):
        name = rng.choice(ATTRIBUTE_NAMES)
        if name in ("credit_limit", "minimum_balance", "overdraft_limit"):
            value = f"{rng.uniform(1000, 50000):.2f}"
        elif name == "interest_rate":
            value = f"{rng.uniform(0.5, 15.0):.2f}"
        elif name in ("annual_fee", "monthly_fee"):
            value = f"{rng.uniform(0, 500):.2f}"
        elif name == "reward_points":
            value = str(rng.randint(0, 10000))
        else:
            value = f"{rng.uniform(100, 10000):.2f}"
        valid_from = ts_between(now - dt.timedelta(days=365), now)
        valid_to = None
        if rng.random() >= 0.8:
            valid_to = valid_from + dt.timedelta(days=rng.randint(30, 365))
        attributes.append({
            "attribute_id": i + 1,  # restarts every batch (1_…py:388)
            "contract_id": rng.choice(new_contract_ids),
            "attribute_name": name,
            "attribute_value": value,
            "valid_from": valid_from,
            "valid_to": valid_to,
            "ingestion_timestamp": ingest,
        })
    out["f_contract_attributes"] = attributes

    transactions = []
    batch_epoch_micros = int(now.timestamp() * 1_000_000)
    for i in range(n_transactions):
        tid, tname, _fin = rng.choice(TRANSACTION_TYPES)
        if "INVESTMENT" in tname:
            amount = rng.uniform(100, 10000)
        elif "PIX" in tname:
            amount = rng.uniform(10, 2000)
        elif "CREDIT" in tname:
            amount = rng.uniform(20, 5000)
        elif "LOAN" in tname:
            amount = rng.uniform(1000, 50000)
        else:
            amount = rng.uniform(5, 1000)
        if any(tok in tname for tok in ("OUT", "SENT", "PAYMENT", "BUY")):
            amount = -amount
        requested = int(ts_between(now - dt.timedelta(days=30), now).timestamp())
        transactions.append({
            "transaction_id": batch_epoch_micros + i,
            "contract_id": rng.choice(state.known_contract_ids),
            "transaction_type_id": tid,
            "requested_at_time_id": requested,
            "completed_at_time_id": requested + rng.randint(1, 300),
            "transaction_status": _weighted(rng, TXN_STATUS),
            "amount": round(amount, 2),
            "currency": "BRL",
            "ingestion_timestamp": ingest,
        })
    out["f_transactions"] = transactions
    return out


def batch_to_dataframes(spark: SparkSession, batch: dict[str, list[dict]]) -> dict[str, DataFrame]:
    """S1 with explicit schemas (the reference infers — SURVEY §1.4)."""
    return {
        name: spark.createDataFrame(rows, schema=FINTECH_SCHEMAS[name])
        for name, rows in batch.items()
    }
