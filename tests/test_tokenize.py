"""Frozen-vocab greedy subword tokenizer: contract vs a pure-Python
replay, plus degenerate inputs."""

from pyspark.sql import functions as F

from machine_learning_with_spark_streaming_spark.functions.bpe_artifacts import MAX_TOKEN_LEN, VOCAB
from machine_learning_with_spark_streaming_spark.operators.tokenize import subword_tokenize, subword_tokens


def _py_greedy(word: str) -> list[str]:
    out, pos = [], 0
    vocab = set(VOCAB)
    while pos < len(word):
        for length in range(MAX_TOKEN_LEN, 1, -1):
            if word[pos : pos + length] in vocab:
                out.append(word[pos : pos + length])
                pos += length
                break
        else:
            out.append(word[pos])
            pos += 1
    return out


def test_subword_tokens_match_python_replay(spark):
    words = [
        "join", "joiner", "hashing", "batch", "zzzqqq", "a",
        "matchmaker", "partition", "stochastic", VOCAB[0] + VOCAB[16],
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r.w: r.toks for r in df.select("w", subword_tokens(F.col("w")).alias("toks")).collect()}
    for w in words:
        assert got[w] == _py_greedy(w), w
        assert "".join(got[w]) == w  # tokenization is lossless


def test_subword_tokenize_degenerate_docs(spark):
    df = spark.createDataFrame(
        [(1, "  "), (2, ""), (3, None), (4, "one two")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in subword_tokenize(df).collect()}
    import hashlib
    empty_sig = hashlib.md5(b"").hexdigest()
    for d in (1, 2, 3):
        assert rows[d].n_subword_tokens == 0
        assert rows[d].token_sig == empty_sig
    toks = _py_greedy("one") + _py_greedy("two")
    assert rows[4].n_subword_tokens == len(toks)
    assert rows[4].token_sig == hashlib.md5(" ".join(toks).encode()).hexdigest()


def test_unicode_line_terminators_are_not_dropped(spark):
    """Java regex '.' excludes U+2028/U+2029/U+0085 — which the
    ASCII-only whitespace normalization does NOT collapse — so the
    fallback must run in DOTALL mode or those characters silently
    vanish from the token stream, breaking losslessness and oracle
    parity."""
    from pyspark.sql import functions as F

    words = ["a\u2028b", "x\u2029y", "p\u0085q"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r.w: r.toks
        for r in df.select("w", subword_tokens(F.col("w")).alias("toks")).collect()
    }
    for w in words:
        assert "".join(got[w]) == w, (w, got[w])
