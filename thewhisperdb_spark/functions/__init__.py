from thewhisperdb_spark.functions.llm import (  # noqa: F401
    assemble_node_text,
    embed_missing,
    hash_embedder,
    keyword_tagger,
)
