"""Unit tests for normalization P1-P4 (SURVEY §5.1)."""

from pyspark.sql import functions as F

from hgcn_name_disambiguation_spark.functions.text import (
    porter_stem,
    title_tokens,
)
from hgcn_name_disambiguation_spark.functions.names import block_key


def test_porter_stem_known_values():
    # Canonical examples from Porter (1980).
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("cats") == "cat"
    assert porter_stem("feed") == "feed"
    assert porter_stem("agreed") == "agre"
    assert porter_stem("plastered") == "plaster"
    assert porter_stem("motoring") == "motor"
    assert porter_stem("relational") == "relat"
    assert porter_stem("conditional") == "condit"
    assert porter_stem("triplicate") == "triplic"
    assert porter_stem("formative") == "form"
    assert porter_stem("probate") == "probat"
    assert porter_stem("controllable") == "control"  # step4 + step5b


def test_title_tokens_chain(spark):
    df = spark.createDataFrame(
        [("A Study, of (Neural) Networks; using GPUs!",)], ["title"]
    )
    out = df.select(title_tokens(F.col("title")).alias("toks")).first()
    toks = set(out.toks)
    # "a" dropped (len<=1), "of"/"using" stopwords, punctuation stripped,
    # remaining tokens stemmed + lowercased.
    assert "studi" in toks
    assert "neural" in toks
    assert "network" in toks
    assert "gpu" in toks
    assert "of" not in toks and "using" not in toks and "us" not in toks


def test_stoplist_parity_reference_order(spark):
    """Reference semantics (name_disambiguation.py:772-773,845-848):
    the 16-word stoplist is stemmed, and each token is stemmed FIRST,
    then dropped iff its STEM is in the stemmed list. Hand-computed
    expectations for the inflection cases the order matters for:
      using   -> stem 'us'     in list (from 'using')   -> dropped
      uses    -> stem 'us'     in list (step 5a drops e) -> dropped
      user    -> stem 'user'   NOT in list               -> kept
      methods -> stem 'method' in list (from 'method')  -> dropped
      models  -> stem 'model'  in list (from 'model')   -> dropped
      algrithom (the reference's typo)                  -> dropped
    A raw-token-first filter (the round-1 bug) would have KEPT
    uses/methods/models.
    """
    df = spark.createDataFrame(
        [("Using uses user methods models algrithom clustering",)], ["title"]
    )
    toks = set(
        df.select(title_tokens(F.col("title")).alias("t")).first().t
    )
    assert toks == {"user", "cluster"}


def test_stop_stems_match_reference_list():
    from hgcn_name_disambiguation_spark.functions.text import STOP_STEMS

    # stems of: at based in of for on and to an using with the method
    # algrithom by model (name_disambiguation.py:772)
    assert set(STOP_STEMS) == {
        "at", "base", "in", "of", "for", "on", "and", "to", "an", "us",
        "with", "the", "method", "algrithom", "by", "model",
    }


def test_block_key(spark):
    df = spark.createDataFrame(
        [("Ajay K. Gupta",), ("LEI   WANG",), ("Prince",)], ["name"]
    )
    rows = df.select(block_key(F.col("name")).alias("bk")).collect()
    assert [r.bk for r in rows] == ["ajay gupta", "lei wang", "prince"]
