"""Wallet clustering (SURVEY.md §2.12 G3) — implements what the
reference only declared: AddressWalletID (T:137) is stubbed there
(walletIDCounter initialized at B:58, never incremented, always written
0 at B:896).

Heuristic: the standard co-spend (common-input-ownership) clustering —
addresses whose outputs are spent by the same transaction belong to one
wallet. Edges are star-shaped per tx (each address linked to the tx's
first address) so a tx spending k addresses contributes k−1 edges, not
k², then connected components (graph/components.py) label the wallets.
Wallet id = min address in the component; singletons keep their own id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph.components import connected_components
from .derive import spent_inputs


def co_spend_edges(inputs: DataFrame, outputs: DataFrame) -> DataFrame:
    """(src, dst) address pairs co-spent by one transaction."""
    si = spent_inputs(inputs, outputs).select(
        F.col("spending_tx_hash").alias("tx_hash"), "address"
    ).distinct()
    anchor = si.groupBy("tx_hash").agg(F.min("address").alias("src"))
    return (
        si.join(anchor, "tx_hash")
        .where(F.col("address") != F.col("src"))
        .select("src", F.col("address").alias("dst"))
        .distinct()
    )


def wallet_ids(inputs: DataFrame, outputs: DataFrame) -> DataFrame:
    """(address, wallet_id) for every address that ever received."""
    edges = co_spend_edges(inputs, outputs)
    comp = connected_components(edges, "src", "dst", canonical=True)
    clustered = comp.select(F.col("node").alias("address"), F.col("comp").alias("wallet_id"))
    singles = (
        outputs.select("address")
        .distinct()
        .join(clustered, "address", "left_anti")
        .select("address", F.col("address").alias("wallet_id"))
    )
    return clustered.unionByName(singles)


def incremental_wallet_ids(
    labels: DataFrame, inputs_delta: DataFrame, outputs_all: DataFrame
) -> DataFrame:
    """Fold a micro-batch of new spends into an existing (address,
    wallet_id) labeling, re-clustering only the wallets the batch
    touches (graph/components.incremental_components). `outputs_all` is
    the full outputs table (new spends may consume old outputs); new
    never-clustered addresses enter as singletons of themselves.

    The scalable M2-style maintenance for G3: per micro-batch the work
    is O(affected wallets + batch), not O(address universe).
    """
    from ..graph.components import incremental_components

    new_edges = co_spend_edges(inputs_delta, outputs_all)
    relabeled = incremental_components(
        labels.select(
            F.col("address").alias("node"), F.col("wallet_id").alias("comp")
        ),
        new_edges,
    )
    clustered = relabeled.select(
        F.col("node").alias("address"), F.col("comp").alias("wallet_id")
    )
    singles = (
        outputs_all.select("address")
        .distinct()
        .join(clustered, "address", "left_anti")
        .select("address", F.col("address").alias("wallet_id"))
    )
    return clustered.unionByName(singles)
