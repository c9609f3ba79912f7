"""PySpark-native entity-resolution engine.

A from-scratch re-design (NOT a port) of the capabilities of
``zhizhen-kyle-luo/HGCN-name-disambiguation`` (read-only reference at
``/root/reference/``): author-name disambiguation rebuilt as a
blocking -> candidate-pair scoring -> threshold -> transitive-clustering
record-linkage pipeline over a table of source-repository files
``(repo, path, commit, lang, content)``, expressed entirely in the
Spark DataFrame/SQL API with Arrow-batched pandas UDFs for the few
non-relational kernels (stemming, Jaro-Winkler).

Reference provenance is cited per module as ``file:line`` into
``/root/reference/``.
"""

__version__ = "0.1.0"
