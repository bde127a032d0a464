"""Derivation pipeline: every derived property of the reference's data
model (SURVEY.md §1.4) computed declaratively from the four normalized
tables — the replacement for the reference's addBlock/addTransaction/
addAddress/calculateAndUpdateAddress read-modify-write code
(B:533–547, B:780–834, B:837–947, B:950–983).

Design stance (§1.6): derived statistics are *aggregation queries*, not
maintained mutable state. Batch recompute is deterministic and
idempotent; incremental maintenance (maintain.py) re-runs these over
affected partitions instead of decrementing counters.

Scale notes: every aggregate below is a keyed groupBy (partial+final
hash agg); joins are FK equi-joins on tx_hash/output_id/address —
partitionable by key with no row-at-a-time access. At 100 TB the input
tables are partitioned by height range, and all per-address stats
shuffle once on `address`.

Known reference bugs NOT replicated (SURVEY §7 watch-list): the
misspelled insert key `TransactionIsBetweenAddress` (B:226 vs T:147) —
we implement the declared property; the BlockFee Integer/long schema
mismatch (T:123 vs B:172) — fees are LongType; per-occurrence
double-counting of AddressTransactionCount when an address appears
twice in one tx — we count distinct incident transactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# building blocks


def spent_inputs(inputs: DataFrame, outputs: DataFrame) -> DataFrame:
    """input edge joined to its source output: (spending_tx_hash,
    spent_output_id, value, address) — the J4 owner lookup (B:578
    out("locked")) as one FK join."""
    return inputs.join(
        outputs.select(
            F.col("output_id").alias("spent_output_id"),
            F.col("value"),
            F.col("address"),
        ),
        "spent_output_id",
    )


def output_state(outputs: DataFrame, inputs: DataFrame) -> DataFrame:
    """Output vertex properties (T:150–152): OutputHeight = output_index,
    OutputBalance = value, OutputIsUsed = spent flag. The reference flips
    is_used per spend (B:247) and back on reorg (B:575); here it is a
    semi-join — rollback is automatic when input rows disappear."""
    spent = inputs.select(F.col("spent_output_id").alias("output_id")).distinct()
    return (
        outputs.join(
            spent.withColumn("is_used", F.lit(True)), "output_id", "left"
        )
        .withColumn("is_used", F.coalesce(F.col("is_used"), F.lit(False)))
        .select(
            "output_id",
            "tx_hash",
            F.col("output_index").alias("output_height"),
            F.col("value").alias("output_balance"),
            "address",
            "is_used",
        )
    )


def transaction_stats(
    transactions: DataFrame, outputs: DataFrame, inputs: DataFrame
) -> DataFrame:
    """Transaction vertex properties (T:140–147, computed B:780–834,
    B:1027–1031, B:1077–1088):

    input_count / output_count  — A2
    balance   = Σ input values, 0 for coinbase — A3 (B:784)
    fee       = balance − Σ output values, 0 for coinbase — A4 (B:788–793)
    is_between_one_address — exactly one distinct address across the tx's
        input-source and output addresses (declared semantics of T:147;
        B:873–882)
    new_address_count — # addresses whose first-ever receipt (ordered by
        height, tx_index, output_index) is in this tx — A9 (B:1077–1080)
    """
    si = spent_inputs(inputs, outputs)
    in_agg = si.groupBy(F.col("spending_tx_hash").alias("tx_hash")).agg(
        F.count(F.lit(1)).alias("input_count"),
        F.sum("value").alias("in_sum"),
        F.countDistinct("address").alias("n_in_addrs"),
    )
    out_agg = outputs.groupBy("tx_hash").agg(
        F.count(F.lit(1)).alias("output_count"),
        F.sum("value").alias("out_sum"),
        F.countDistinct("address").alias("n_out_addrs"),
    )
    # distinct address count across both sides (A11 HashSet union)
    both_addrs = (
        si.select(F.col("spending_tx_hash").alias("tx_hash"), "address")
        .union(outputs.select("tx_hash", "address"))
        .groupBy("tx_hash")
        .agg(F.countDistinct("address").alias("n_addrs"))
    )

    new_addr = _new_address_counts(transactions, outputs)

    zero = F.lit(0).cast("long")
    return (
        transactions.join(in_agg, "tx_hash", "left")
        .join(out_agg, "tx_hash", "left")
        .join(both_addrs, "tx_hash", "left")
        .join(new_addr, "tx_hash", "left")
        .select(
            "tx_hash",
            "block_hash",
            "tx_date",
            "is_coinbase",
            F.coalesce("input_count", F.lit(0)).cast("int").alias("input_count"),
            F.coalesce("output_count", F.lit(0)).cast("int").alias("output_count"),
            F.when(F.col("is_coinbase"), zero)
            .otherwise(F.coalesce("in_sum", zero))
            .alias("balance"),
            F.when(F.col("is_coinbase"), zero)
            .otherwise(F.coalesce("in_sum", zero) - F.coalesce("out_sum", zero))
            .alias("fee"),
            (F.coalesce("n_addrs", F.lit(0)) == 1).alias("is_between_one_address"),
            F.coalesce("new_address_count", F.lit(0)).cast("int").alias(
                "new_address_count"
            ),
        )
    )


def _new_address_counts(transactions: DataFrame, outputs: DataFrame) -> DataFrame:
    """Per tx: # addresses first seen in it (receive side defines
    appearance, as in the reference where addresses are inserted on
    output processing, B:328–340)."""
    placed = outputs.join(
        transactions.select(
            "tx_hash",
            "tx_index",
            F.col("block_hash").alias("_bh"),
        ),
        "tx_hash",
    )
    # order of appearance: (tx_date, tx_index, output_index) — tx_date is
    # the block date, so this is (height, position-in-block, position-in-tx)
    placed = placed.join(
        transactions.select("tx_hash", "tx_date"), "tx_hash"
    ).select("tx_hash", "address", "tx_date", "tx_index", "output_index")
    w = W.partitionBy("address")
    first = placed.withColumn(
        "first_key",
        F.min(F.struct("tx_date", "tx_index", "output_index", "tx_hash")).over(w),
    )
    first_tx = (
        first.where(
            (F.col("tx_date") == F.col("first_key.tx_date"))
            & (F.col("tx_index") == F.col("first_key.tx_index"))
            & (F.col("output_index") == F.col("first_key.output_index"))
            & (F.col("tx_hash") == F.col("first_key.tx_hash"))
        )
        .select("address", "tx_hash")
        .distinct()
    )
    return first_tx.groupBy("tx_hash").agg(
        F.count(F.lit(1)).alias("new_address_count")
    )


def block_stats(
    blocks: DataFrame, transactions: DataFrame, outputs: DataFrame, inputs: DataFrame
) -> DataFrame:
    """Block vertex properties (T:118–123, computed B:533–564, B:1007–1041):

    transaction_count — A1 (B:538–540)
    coinbase_balance  — inflation (B:541)
    balance = inflation + Σ non-coinbase input sums — A3 (B:1011, B:1037)
    fee     = Σ tx fees — A4 (B:1039–1041; long, not the schema's Integer)
    """
    tx = transaction_stats(transactions, outputs, inputs)
    per_block = tx.groupBy("block_hash").agg(
        F.count(F.lit(1)).alias("transaction_count"),
        F.sum(F.when(~F.col("is_coinbase"), F.col("balance")).otherwise(0)).alias(
            "tx_in_sum"
        ),
        F.sum("fee").alias("fee"),
    )
    return blocks.join(
        per_block, blocks.hash == per_block.block_hash, "left"
    ).select(
        "hash",
        "prev_hash",
        "height",
        "block_date",
        F.coalesce("transaction_count", F.lit(0)).cast("int").alias(
            "transaction_count"
        ),
        F.col("coinbase_balance"),
        (F.col("coinbase_balance") + F.coalesce("tx_in_sum", F.lit(0))).alias(
            "balance"
        ),
        F.coalesce("fee", F.lit(0)).alias("fee"),
    )


def address_stats(
    transactions: DataFrame, outputs: DataFrame, inputs: DataFrame
) -> DataFrame:
    """The 12 per-address statistics (T:126–137, maintained imperatively
    at B:837–947 and B:950–983; here: one signed aggregation + two
    counterparty joins, all shuffling once on `address`):

    received / spent / balance        — A5 (B:856–862, B:912–919)
    first_appear / last_appear        — A6 (B:858–859, B:886–887, B:583–589)
    transaction_count, input_transaction_count, output_transaction_count
                                      — A7 (B:863–867, B:920–924; distinct txs)
    input_address_count / output_address_count — A8, the 3-hop
        counterparty count-distinct with self excluded (B:950–983)
    between_address_transaction_count — A10 (B:876–877)
    (wallet_id lives in wallets.py — the reference stubbed it, T:137)
    """
    si = spent_inputs(inputs, outputs)
    tx_dates = transactions.select("tx_hash", "tx_date")

    recv = (
        outputs.join(tx_dates, "tx_hash")
        .groupBy("address")
        .agg(
            F.sum("value").alias("received"),
            F.countDistinct("tx_hash").alias("input_transaction_count"),
            F.min("tx_date").alias("first_appear"),
            F.max("tx_date").alias("last_recv"),
        )
    )
    spend = (
        si.join(tx_dates, si.spending_tx_hash == tx_dates.tx_hash)
        .groupBy("address")
        .agg(
            F.sum("value").alias("spent"),
            F.countDistinct("spending_tx_hash").alias("output_transaction_count"),
            F.max("tx_date").alias("last_spend"),
        )
    )
    n_tx = (
        outputs.select("address", "tx_hash")
        .union(si.select("address", F.col("spending_tx_hash")))
        .groupBy("address")
        .agg(F.countDistinct("tx_hash").alias("transaction_count"))
    )

    # A8: 3-hop counterparties. Funders of this address: source addresses
    # of the txs that paid it; payees: destination addresses of the txs it
    # funded. Self excluded on both sides (B:964, B:974).
    paid_by_tx = outputs.select("tx_hash", "address")  # tx -> payee
    funded_by = si.select(F.col("spending_tx_hash").alias("tx_hash"), F.col("address").alias("funder"))
    in_cp = (
        paid_by_tx.join(funded_by, "tx_hash")
        .where(F.col("address") != F.col("funder"))
        .groupBy("address")
        .agg(F.countDistinct("funder").alias("input_address_count"))
    )
    out_cp = (
        funded_by.withColumnRenamed("funder", "address_")
        .join(paid_by_tx.withColumnRenamed("address", "payee"), "tx_hash")
        .where(F.col("address_") != F.col("payee"))
        .groupBy(F.col("address_").alias("address"))
        .agg(F.countDistinct("payee").alias("output_address_count"))
    )

    # A10: txs where exactly one distinct address spans both sides
    tx_addr = (
        si.select(F.col("spending_tx_hash").alias("tx_hash"), "address")
        .union(outputs.select("tx_hash", "address"))
    )
    one_addr_tx = (
        tx_addr.groupBy("tx_hash")
        .agg(F.countDistinct("address").alias("n"), F.min("address").alias("addr"))
        .where(F.col("n") == 1)
    )
    # only count it when the address is on both sides (a real self-transfer)
    has_input = si.select(F.col("spending_tx_hash").alias("tx_hash")).distinct()
    self_tx = (
        one_addr_tx.join(has_input, "tx_hash", "left_semi")
        .groupBy(F.col("addr").alias("address"))
        .agg(F.count(F.lit(1)).alias("between_address_transaction_count"))
    )

    zero = F.lit(0).cast("long")
    return (
        recv.join(spend, "address", "full_outer")
        .join(n_tx, "address", "left")
        .join(in_cp, "address", "left")
        .join(out_cp, "address", "left")
        .join(self_tx, "address", "left")
        .select(
            "address",
            (F.coalesce("received", zero) - F.coalesce("spent", zero)).alias("balance"),
            F.coalesce("received", zero).alias("received"),
            F.coalesce("spent", zero).alias("spent"),
            F.col("first_appear"),
            F.greatest(
                F.coalesce("last_recv", F.col("first_appear")),
                F.coalesce("last_spend", F.col("first_appear")),
            ).alias("last_appear"),
            F.coalesce("transaction_count", F.lit(0)).cast("int").alias(
                "transaction_count"
            ),
            F.coalesce("input_transaction_count", F.lit(0)).cast("int").alias(
                "input_transaction_count"
            ),
            F.coalesce("output_transaction_count", F.lit(0)).cast("int").alias(
                "output_transaction_count"
            ),
            F.coalesce("input_address_count", F.lit(0)).cast("int").alias(
                "input_address_count"
            ),
            F.coalesce("output_address_count", F.lit(0)).cast("int").alias(
                "output_address_count"
            ),
            F.coalesce("between_address_transaction_count", F.lit(0))
            .cast("int")
            .alias("between_address_transaction_count"),
        )
    )


def derive_all(tables: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """One pass over the four normalized tables → every §1.4 derived table
    (the declarative replacement for parseBlock, B:1007–1094)."""
    return {
        "block_stats": block_stats(
            tables["blocks"], tables["transactions"], tables["outputs"], tables["inputs"]
        ),
        "transaction_stats": transaction_stats(
            tables["transactions"], tables["outputs"], tables["inputs"]
        ),
        "output_state": output_state(tables["outputs"], tables["inputs"]),
        "address_stats": address_stats(
            tables["transactions"], tables["outputs"], tables["inputs"]
        ),
    }
