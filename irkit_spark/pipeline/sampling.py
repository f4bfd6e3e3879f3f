"""Deterministic corpus sampling for training-data pipelines.

A 100 TB pipeline can't use rand(): resampling must be reproducible
across reruns, cluster sizes, and engines (the holdout a run carved
out yesterday must be the same holdout today). Sampling here is a pure
function of the row key via portable 31-bit arithmetic (every
intermediate fits int64, so the exact same expression runs in Spark
and the DuckDB oracle — the repo's portable-hash pattern).

Scale shape: a single codegen'd filter on a numeric column — no
shuffle, no UDF, predicate pushes into the scan when the key column
is a parquet column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 31-bit modulus (Mersenne prime) and LCG-style mix constants. a < 2^31
# and x < 2^31 keep a*x < 2^62 < int64 max; the squaring step diffuses
# low bits (a plain LCG mod P leaves id-adjacent keys bucket-adjacent).
P = 2_147_483_647
A = 1_103_515_245
C = 12_345


def hash_key(key: Column) -> Column:
    """Portable deterministic 31-bit mix of an integer key column.

    h1 = (key mod P) * A + C mod P; h2 = (h1^2 + h1) mod P.
    Identical text in SQL: every product of two values < 2^31 fits a
    signed 64-bit integer in any engine."""
    x = F.pmod(key.cast("long"), F.lit(P))
    h1 = F.pmod(x * F.lit(A) + F.lit(C), F.lit(P))
    return F.pmod(h1 * h1 + h1, F.lit(P))


def hash_key_sql(key: str) -> str:
    """The same mix as ANSI-SQL text (DuckDB oracle form)."""
    x = f"(({key}) % {P})"
    h1 = f"(({x} * {A} + {C}) % {P})"
    return f"(({h1} * {h1} + {h1}) % {P})"


def hash_sample(df: DataFrame, num: int, den: int,
                key_col: str = "doc_id") -> DataFrame:
    """Keep rows where mix(key) mod den < num — a deterministic
    num/den sample, stable under reruns, partitioning, and engine.
    Disjoint splits come from disjoint residue ranges (e.g. train =
    residue < 98, holdout = residue >= 98 of den=100): every row lands
    in exactly one split by construction."""
    if not (0 <= num <= den) or den <= 0:
        raise ValueError(f"need 0 <= num <= den, den > 0: {num}/{den}")
    return df.filter(F.pmod(hash_key(F.col(key_col)), F.lit(den))
                     < F.lit(num))


def hash_split(df: DataFrame, den: int, key_col: str = "doc_id",
               split_col: str = "split",
               boundaries: dict[str, int] | None = None) -> DataFrame:
    """Label every row with its split: residue r = mix(key) mod den,
    split = first name whose boundary exceeds r (boundaries sorted by
    value; e.g. {"train": 98, "val": 99, "test": 100} with den=100 is
    a 98/1/1 split). Total coverage required: max boundary == den."""
    bounds = sorted((boundaries or {"train": den * 98 // 100,
                                    "val": den * 99 // 100,
                                    "test": den}).items(),
                    key=lambda kv: kv[1])
    if bounds[-1][1] != den:
        raise ValueError(f"split boundaries must cover den={den}: "
                         f"{bounds}")
    r = F.pmod(hash_key(F.col(key_col)), F.lit(den))
    expr = F.lit(bounds[-1][0])
    for name, b in reversed(bounds[:-1]):
        expr = F.when(r < F.lit(b), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def mixture_sample(df: DataFrame, weights: dict[str, float],
                   domain_col: str, key_col: str = "doc_id",
                   default_weight: float = 1.0,
                   den: int = 1_000_000) -> DataFrame:
    """Domain-weighted deterministic up/down-sampling — pretraining
    mixture construction (the Pile / Llama-style per-source epoch
    weights). A domain with weight w emits each of its rows
    floor(w) times (epochs 0..floor(w)-1) plus one more epoch for a
    deterministic frac(w) subset; w < 1 is a plain downsample, w = 0
    drops the domain. Domains absent from `weights` get
    `default_weight`.

    Fully deterministic: the fractional-epoch choice is the same
    mix(key) residue test as hash_sample — identical rows are kept
    across reruns, cluster sizes, and engines, and changing one
    domain's weight does not reshuffle another's sample. Fractions
    quantize to 1/den (round(frac * den) residues).

    Returns the input rows with an added `epoch` column (long,
    0-based; upsampled rows appear once per epoch). Scale shape: a
    codegen'd when-chain over the config-sized weights dict + one
    explode of a <= ceil(w)-element sequence — no shuffle, no UDF,
    rand()-free."""
    if den <= 0:
        raise ValueError(f"den must be > 0: {den}")
    plan: dict[str, tuple[int, int]] = {}
    for dom, w in {**weights, None: default_weight}.items():
        if w < 0:
            raise ValueError(f"negative weight for {dom!r}: {w}")
        full = int(w)
        plan[dom] = (full, round((w - full) * den))
    r = F.pmod(hash_key(F.col(key_col)), F.lit(den))
    d_full, d_frac = plan.pop(None)
    n = F.lit(d_full) + (r < F.lit(d_frac)).cast("int")
    for dom in sorted(plan):
        full, frac = plan[dom]
        n = F.when(F.col(domain_col) == F.lit(dom),
                   F.lit(full) + (r < F.lit(frac)).cast("int")) \
            .otherwise(n)
    epochs = F.when(n > 0, F.sequence(F.lit(0), n - 1)) \
        .otherwise(F.array().cast("array<integer>"))
    return (df.select("*", F.explode(epochs).alias("epoch"))
            .withColumn("epoch", F.col("epoch").cast("long")))
