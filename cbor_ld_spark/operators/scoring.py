"""Triple precision/recall scoring + skew-tolerant join utilities.

``triple_pr`` is the pipeline's acceptance gate as a dataflow: emitted
vs reference triples compared with set semantics (inner join on the
triple key = true positives; ``left_anti`` each way = FP/FN).  At corpus
scale both sides shuffle once on the same key; the key is a hash of the
full triple, so it is uniform and skew-free by construction.

``salted_join`` is the explicit skew pattern (SURVEY §2B): replicate the
small side S ways, salt the big side's hot keys, join on (key, salt).
AQE's skew-join handles most cases; this is for joins *inside* iterative
loops or grouped-map stages where AQE cannot re-plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TRIPLE_KEY_COLS = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype",
                   "obj_lang", "graph"]


def _triple_key(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "triple_key",
        F.sha2(F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                      for c in TRIPLE_KEY_COLS]), 256))


def triple_pr(emitted: DataFrame, reference: DataFrame) -> DataFrame:
    """One-row DataFrame: tp/fp/fn + precision/recall of emitted triples."""
    e = _triple_key(emitted).select("triple_key").distinct()
    r = _triple_key(reference).select("triple_key").distinct()
    tp = e.join(r, "triple_key").count()
    fp = e.join(r, "triple_key", "left_anti").count()
    fn = r.join(e, "triple_key", "left_anti").count()
    spark = emitted.sparkSession
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    return spark.createDataFrame(
        [(tp, fp, fn, round(precision, 6), round(recall, 6))],
        "tp long, fp long, fn long, precision double, recall double")


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt: int = 16, how: str = "inner",
                keep_salt: bool = False) -> DataFrame:
    """Equi-join where ``big[key]`` is skewed: salt big, replicate small.

    big gains a uniform pseudo-random salt in [0, S); small is exploded
    S-fold; the join key becomes (key, salt).  Shuffle partitions for the
    hot key are split S ways.  ``small`` must actually be small (it is
    replicated S times).

    Only join types that never emit unmatched *small*-side rows are
    valid: right/full outer would surface each unmatched small key S
    times (one per replica).
    """
    valid = {"inner", "left", "left_outer", "leftouter", "left_semi",
             "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in valid:
        raise ValueError(
            f"salted_join supports {sorted(valid)}; '{how}' would emit "
            "unmatched small-side rows once per salt replica")
    # Salt must spread even byte-identical rows (duplicate-heavy hot keys
    # are exactly what salting exists for) and be retry-deterministic.
    # rand(seed) reseeds per partition index and replays identically on
    # task recompute, unlike monotonically_increasing_id; a content hash
    # would send all duplicates of a hot row to one salt (and cannot
    # hash map-typed columns at all).
    big_s = big.withColumn(
        "_salt", F.floor(F.rand(42) * salt).cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = big_s.join(small_s, [key, "_salt"], how)
    # keep_salt exposes the assignment for determinism tests/diagnostics
    return out if keep_salt else out.drop("_salt")
