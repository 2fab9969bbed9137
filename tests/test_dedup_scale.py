"""Scale-shape tests for the dedup family (VERDICT r03 items 1/3).

1. Exact-duplicate clusters must NOT quadratically explode LSH banding:
   k byte-identical docs contribute exactly k-1 star edges (canonical →
   copy), not k²/2 pairs per band.
2. min_label_components must converge on a long chain graph (diameter ≥
   32) — exercising the pointer-jumping AND the every-5-rounds
   localCheckpoint lineage truncation.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rapidocr_spark.functions.dedup import (
    dedup_components, lsh_candidate_pairs, min_label_components,
)


@pytest.fixture()
def dup_corpus_dir(spark, tmp_path):
    """documents.parquet with 200 byte-identical docs + 20 distinct ones."""
    k = 200
    body = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [{"doc_id": i, "text": body, "lang": "en"} for i in range(k)]
    for i in range(20):
        rows.append(
            {
                "doc_id": k + i,
                "text": f"unique document {i} " + " ".join(
                    f"tok{i}_{j}" for j in range(12)
                ),
                "lang": "en",
            }
        )
    pd.DataFrame(rows).to_parquet(os.path.join(tmp_path, "documents.parquet"))
    return str(tmp_path)


def test_exact_dup_cluster_yields_linear_star_edges(spark, dup_corpus_dir):
    pairs = lsh_candidate_pairs(spark, dup_corpus_dir).toPandas()
    k = 200
    # the identical cluster contributes exactly k-1 star edges from the
    # canonical (min doc_id = 0), NOT k*(k-1)/2 ≈ 20k clique pairs
    cluster = pairs[(pairs.doc_a < k) & (pairs.doc_b < k)]
    assert len(cluster) == k - 1
    assert (cluster.doc_a == 0).all()
    assert set(cluster.doc_b) == set(range(1, k))
    # and the total output stays O(k): no quadratic residue anywhere
    assert len(pairs) < 2 * k


def test_exact_dup_cluster_single_component(spark, dup_corpus_dir):
    comp = dedup_components(spark, dup_corpus_dir).toPandas()
    k = 200
    in_cluster = comp[comp.doc_id < k]
    assert (in_cluster.component_id == 0).all()


def test_min_label_components_long_chain(spark):
    """Chain 0-1-2-…-40 (diameter 40 > 2^5): pointer jumping must converge
    within the 25-round cap, crossing the round-5 localCheckpoint at least
    once, and every node must label to 0."""
    n = 41
    nodes = spark.range(n).select(F.col("id").cast("long").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels = min_label_components(nodes, pairs).toPandas()
    assert len(labels) == n
    assert (labels.component_id == 0).all()


def test_min_label_components_disjoint_graphs(spark):
    nodes = spark.range(10).select(F.col("id").cast("long").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 3), (3, 7), (2, 5), (8, 9)], "doc_a long, doc_b long"
    )
    labels = (
        min_label_components(nodes, pairs).toPandas().set_index("doc_id")["component_id"]
    )
    assert labels[0] == labels[3] == labels[7] == 0
    assert labels[2] == labels[5] == 2
    assert labels[8] == labels[9] == 8
    assert labels[1] == 1 and labels[4] == 4 and labels[6] == 6
