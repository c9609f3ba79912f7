"""Focal-name signature constraints (engine extension; round 3).

The reference blocks records by ``first + last`` of the focal author
(``openAlex_to_HGCN.py:49-91``) and then never looks at the focal
author's OWN raw name again — yet that string carries the strongest
negative evidence in a block: "John A. Smith" can never be the same
person as "John W. Smith", and the reference's own ``raw-data/john
smith.xml`` block mixes Kenneth J. / Thomas J. / Richard J. Smith
under one key. This module turns that into distributed cannot-link
constraints:

1. ``focal_signatures``  — per pub, the given-name token array of the
   block-focal author ("John R. Smith" -> ['john','r']); pure column
   ops (explode + filter + window argmax), no Python.
2. ``resolve_signature_classes`` — per block, the MAXIMAL signatures
   (not refined by any more-specific signature) act as identity
   classes; each pub is assigned to the unique compatible class, or —
   when ambiguous ("J. Smith" is compatible with every class) — to
   the class its match-edge evidence supports most, iterated
   ``config.sig_resolve_rounds`` times (bounded label propagation:
   each round is one join + hash-agg + window argmax, all JVM-side).
3. ``incompatible_cut`` — a boolean column: true iff both endpoints
   resolved to DIFFERENT classes. Used to cut match edges and to
   exclude cross-class evidence from cluster-level refinement.

Token compatibility (standard given-name subsumption): equal tokens
match; an initial matches any token with the same first letter;
position-wise over the zipped arrays, missing tail tokens match.

Scale: the distinct-signature self-join is per block over DISTINCT
signatures only (bounded by given-name variant count, not block
size); every other step is an equi-join keyed by (block_key, pub_id)
or (block_key, class) — the same shuffle keys the rest of the
pipeline uses. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions.names import normalize_name

_SEP = "\x1f"


def _tok_compat(x, y):
    """Column lambda: token compatibility (null = missing tail = ok)."""
    return (
        F.when(x.isNull() | y.isNull(), F.lit(True))
        .otherwise(
            (x == y)
            | (
                ((F.length(x) == 1) | (F.length(y) == 1))
                & (F.substring(x, 1, 1) == F.substring(y, 1, 1))
            )
        )
    )


def sig_compatible(a, b):
    """True iff given-name arrays a and b are position-wise compatible.
    Empty/null arrays carry no information -> compatible."""
    either_empty = (
        a.isNull() | b.isNull() | (F.size(a) == 0) | (F.size(b) == 0)
    )
    return F.when(either_empty, F.lit(True)).otherwise(
        F.forall(F.zip_with(a, b, _tok_compat), lambda v: v)
    )


def _specificity(sig):
    """Orderable specificity struct: (n_tokens, n_full_tokens, total_len)."""
    return F.struct(
        F.size(sig).alias("n"),
        F.size(F.filter(sig, lambda t: F.length(t) > 1)).alias("nf"),
        F.aggregate(
            sig, F.lit(0), lambda acc, t: acc + F.length(t)
        ).alias("tl"),
    )


def focal_signatures(pubs: DataFrame) -> DataFrame:
    """(block_key, pub_id, authors) -> (block_key, pub_id, sig).

    sig = given-name tokens of the best focal-author candidate: an
    author whose normalized LAST token equals the block's last name,
    preferring (a) first token equal to the block first name, then
    (b) initial-compatible first token, then longer signatures.
    Pubs with no candidate get a null sig (no constraint).
    """
    bparts = F.split(F.col("block_key"), " ")
    bfirst = F.element_at(bparts, 1)
    blast = F.element_at(bparts, -1)
    exploded = (
        pubs.select(
            "block_key",
            "pub_id",
            bfirst.alias("_bf"),
            blast.alias("_bl"),
            F.explode("authors").alias("author"),
        )
        .withColumn("_toks", F.split(normalize_name(F.col("author")), " "))
        .where(
            (F.size("_toks") >= 2)
            & (F.element_at("_toks", -1) == F.col("_bl"))
        )
        .withColumn("sig", F.slice("_toks", 1, F.size("_toks") - 1))
        .withColumn("_g1", F.element_at("sig", 1))
        .withColumn(
            "_pri",
            F.when(F.col("_g1") == F.col("_bf"), 2)
            .when(
                (F.substring("_g1", 1, 1) == F.substring("_bf", 1, 1))
                & (
                    (F.length("_g1") == 1) | (F.length("_bf") == 1)
                ),
                1,
            )
            .otherwise(0),
        )
    )
    # among equal-priority candidates prefer the LONGEST signature
    # (more given-name tokens = stronger cannot-link evidence), then
    # the lexicographically first for determinism.
    w = Window.partitionBy("block_key", "pub_id").orderBy(
        F.desc("_pri"), F.size("sig").desc(), F.asc("_g1")
    )
    best = (
        exploded.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("block_key", "pub_id", "sig")
    )
    return pubs.select("block_key", "pub_id").join(
        best, ["block_key", "pub_id"], "left"
    )


def signature_seeds(sigs: DataFrame) -> DataFrame:
    """Per block, the maximal signatures: distinct non-empty sigs not
    strictly refined by a more specific compatible sig in the block.
    Returns (block_key, seed: array<string>, seed_key: string)."""
    d = (
        sigs.where(F.col("sig").isNotNull() & (F.size("sig") > 0))
        .select("block_key", "sig")
        .dropDuplicates(["block_key", "sig"])
    )
    a = d.alias("a")
    b = d.alias("b")
    seeds = a.join(
        b,
        (F.col("a.block_key") == F.col("b.block_key"))
        & (F.col("a.sig") != F.col("b.sig"))
        & sig_compatible(F.col("a.sig"), F.col("b.sig"))
        & (_specificity(F.col("b.sig")) > _specificity(F.col("a.sig"))),
        "left_anti",
    )
    return seeds.select(
        "block_key",
        F.col("sig").alias("seed"),
        F.concat_ws(_SEP, F.col("sig")).alias("seed_key"),
    )


def resolve_signature_classes(
    pubs: DataFrame,
    matches: DataFrame,
    config: PipelineConfig = DEFAULT_CONFIG,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """-> (block_key, pub_id, sig_class) for every pub the constraint
    system can place: unique-candidate pubs directly, ambiguous pubs by
    iterated match-edge evidence voting among their candidate seeds.
    Pubs with no/empty sig or unresolved ambiguity are absent (no
    constraint). Blocks with <= 1 seed are absent (nothing to cut).
    """
    if sigs is None:
        sigs = focal_signatures(pubs)
    seeds = signature_seeds(sigs)
    nseeds = seeds.groupBy("block_key").agg(
        F.count(F.lit(1)).alias("_ns")
    )
    seeds = seeds.join(
        nseeds.where(F.col("_ns") >= 2), "block_key", "left_semi"
    )

    cands = (
        sigs.where(F.col("sig").isNotNull() & (F.size("sig") > 0))
        .join(seeds, "block_key")
        .where(sig_compatible(F.col("sig"), F.col("seed")))
        .select("block_key", "pub_id", "seed_key")
    )
    ncand = cands.groupBy("block_key", "pub_id").agg(
        F.count(F.lit(1)).alias("_nc")
    )
    cands = cands.join(ncand, ["block_key", "pub_id"])
    resolved = (
        cands.where(F.col("_nc") == 1)
        .select("block_key", "pub_id", F.col("seed_key").alias("sig_class"))
    )
    ambiguous = cands.where(F.col("_nc") > 1).select(
        "block_key", "pub_id", "seed_key"
    )

    edges = matches.select("block_key", "id_a", "id_b", "score")
    bidir = edges.select(
        "block_key",
        F.col("id_a").alias("pub_id"),
        F.col("id_b").alias("nbr"),
        "score",
    ).unionByName(
        edges.select(
            "block_key",
            F.col("id_b").alias("pub_id"),
            F.col("id_a").alias("nbr"),
            "score",
        )
    )
    # consumed once per vote round — materialize lazily so the match
    # subtree executes at most once across rounds
    bidir = bidir.localCheckpoint(eager=False)

    # the resolved-classes frame is tiny (<= one row per pub) but its
    # plan embeds the seed self-join + candidate join tree; checkpoint
    # so consumers plan against a flat scan
    resolved = resolved.localCheckpoint(eager=True)

    # corpora without ambiguous signatures (single-seed blocks, e.g.
    # the synthetic fixtures) skip the vote loop entirely — one small
    # aggregation instead of `rounds` join jobs
    if ambiguous.isEmpty():
        return resolved

    for _ in range(max(0, config.sig_resolve_rounds)):
        # evidence toward each candidate class via resolved neighbors
        votes = (
            ambiguous.join(bidir, ["block_key", "pub_id"])
            .join(
                resolved.select(
                    "block_key",
                    F.col("pub_id").alias("nbr"),
                    F.col("sig_class").alias("seed_key"),
                ),
                ["block_key", "nbr", "seed_key"],
            )
            .groupBy("block_key", "pub_id", "seed_key")
            .agg(F.sum("score").alias("_v"))
        )
        w = Window.partitionBy("block_key", "pub_id").orderBy(
            F.desc("_v"), F.asc("seed_key")
        )
        newly = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") == 1) & (F.col("_v") > 0))
            .select(
                "block_key", "pub_id", F.col("seed_key").alias("sig_class")
            )
        )
        # checkpoint the (small) resolved frame so the loop's plan
        # doesn't nest joins `rounds` deep over the full edge frame
        resolved = resolved.unionByName(newly).localCheckpoint(eager=True)
        ambiguous = ambiguous.join(
            resolved, ["block_key", "pub_id"], "left_anti"
        )
    return resolved


def incompatible_cut(
    pairs: DataFrame,
    classes: DataFrame,
    sigs: DataFrame | None = None,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Adds a boolean ``sig_cut`` column: true iff the endpoints'
    focal names contradict —

    - both endpoints resolved to DIFFERENT signature classes, or
    - (with ``sigs``) the endpoints' RAW signatures are position-wise
      incompatible. The raw rule is what makes the cut robust for
      pubs the vote loop could NOT place (an ambiguous "J. M. Smith"
      may stay unresolved between "James M." and "John Maynard", yet
      its edges to "John A. Smith" are still provably wrong).
    """
    ca = classes.select(
        "block_key",
        F.col("pub_id").alias(id_a),
        F.col("sig_class").alias("_ca"),
    )
    cb = classes.select(
        "block_key",
        F.col("pub_id").alias(id_b),
        F.col("sig_class").alias("_cb"),
    )
    out = pairs.join(ca, ["block_key", id_a], "left").join(
        cb, ["block_key", id_b], "left"
    )
    cut = (
        F.col("_ca").isNotNull()
        & F.col("_cb").isNotNull()
        & (F.col("_ca") != F.col("_cb"))
    )
    drop = ["_ca", "_cb"]
    if sigs is not None:
        sa = sigs.select(
            "block_key",
            F.col("pub_id").alias(id_a),
            F.col("sig").alias("_sa"),
        )
        sb = sigs.select(
            "block_key",
            F.col("pub_id").alias(id_b),
            F.col("sig").alias("_sb"),
        )
        out = out.join(sa, ["block_key", id_a], "left").join(
            sb, ["block_key", id_b], "left"
        )
        cut = cut | ~sig_compatible(F.col("_sa"), F.col("_sb"))
        drop += ["_sa", "_sb"]
    return out.withColumn("sig_cut", cut).drop(*drop)
