"""Text analysis + multimodal plumbing: deterministic feature checks on
hand-computable inputs, stub behavior.
"""

from __future__ import annotations

import numpy as np
import pytest

from prom_tsdb_copyer_spark.operators.multimodal import (
    decode_image,
    docs_as_binary,
    extract_features,
    extract_metadata,
    fake_decode_image,
)
from prom_tsdb_copyer_spark.operators.text import (
    fingerprints,
    language_id,
    quality_scores,
    token_counts,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat and the dog, in a house."),
        (1, "der hund und die katze ist nicht da"),
        (2, "xyzzy plugh"),
        (3, "le chat est dans la maison pour que"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts(spark, docs):
    got = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert got[0]["n_tokens"] == 8
    assert got[0]["n_distinct_tokens"] == 7  # 'the' twice
    assert got[4]["n_tokens"] == 0
    assert got[0]["n_chars"] == len("the cat and the dog, in a house.")


def test_language_id(spark, docs):
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[3] == "fr"
    assert got[2] == "unk"
    assert got[4] == "unk"


def test_quality_monotone_in_signal(spark, docs):
    got = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert got[0]["quality_score"] > got[2]["quality_score"]  # stopwords help
    assert 0 <= got[0]["punct_ratio"] < 0.2
    assert got[4]["quality_score"] is not None  # empty doc doesn't crash


def test_fingerprint_stable_and_discriminating(spark, docs):
    fp1 = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs).collect()}
    fp2 = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs).collect()}
    assert fp1 == fp2
    assert len(set(fp1.values())) > 1


# ------------------------------------------------------------ multimodal

def test_metadata_plumbing(spark, docs):
    got = {r["doc_id"]: r for r in
           extract_metadata(docs_as_binary(docs.where("doc_id < 4"))).collect()}
    assert got[0]["n_bytes"] == len("the cat and the dog, in a house.")
    assert got[0]["magic"] == ord("t")
    assert got[0]["fake_width"] == ord("t") % 64 + 1


def test_feature_extraction_batch_shape(spark, docs):
    feats = extract_features(docs_as_binary(docs.where("doc_id < 4"))).collect()
    assert len(feats) == 4
    for r in feats:
        assert 0 <= r["mean_r"] <= 255


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG...")


def test_fake_decode_deterministic():
    a = fake_decode_image(b"hello world", 4, 4)
    b = fake_decode_image(b"hello world", 4, 4)
    assert a.shape == (4, 4, 3) and np.array_equal(a, b)


def test_repetition_scores(spark):
    from prom_tsdb_copyer_spark.operators.text import repetition_scores

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),          # one token repeated
            (2, "a b c d e f g h i j"),                    # all distinct
            (3, "x y z x y z x y z x y z"),                # repeated trigram
            (4, ""),                                        # empty
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_scores(docs).collect()}
    assert got[1]["dup_token_ratio"] > 0.8 and got[1]["top_token_ratio"] == 1.0
    assert got[2]["dup_token_ratio"] == 0.0 and got[2]["dup_ngram_ratio"] == 0.0
    assert got[3]["dup_ngram_ratio"] > 0.6          # trigrams repeat heavily
    assert got[4]["dup_token_ratio"] == 0.0 and got[4]["dup_ngram_ratio"] == 0.0


def test_gopher_quality_flags(spark):
    from prom_tsdb_copyer_spark.operators.text import gopher_quality_flags

    long_ok = " ".join(["the quick brown fox jumps over a lazy dog now"] * 6)
    symbols = " ".join(["ok"] * 60) + " " + "# " * 20
    numeric = " ".join(["1234"] * 60)
    docs = spark.createDataFrame(
        [
            (1, long_ok),           # 60 normal words -> all flags pass
            (2, "too short"),       # < 50 words
            (3, symbols),           # symbol ratio > 0.1
            (4, numeric),           # no alphabetic words
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert all(got[1][c] for c in
               ("ok_word_count", "ok_mean_word_len", "ok_symbol_ratio", "ok_alpha_words"))
    assert not got[2]["ok_word_count"]
    assert not got[3]["ok_symbol_ratio"]
    assert not got[4]["ok_alpha_words"]


def test_repetition_top_token_fold_matches_bruteforce(spark):
    """The sorted run-length fold must equal a python Counter on a
    messy mixed-frequency doc (guards the r4 rewrite of the previously
    quadratic distinct x filter kernel)."""
    import collections
    import random

    from prom_tsdb_copyer_spark.operators.text import repetition_scores

    rnd = random.Random(11)
    toks = [f"w{rnd.randint(0, 40)}" for _ in range(3000)]
    text = " ".join(toks)
    top, total = collections.Counter(toks).most_common(1)[0][1], len(toks)
    got = repetition_scores(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).collect()[0]
    assert got["top_token_ratio"] == round(top / total, 4)


def test_repetition_scores_long_doc_not_quadratic(spark):
    """A 100k-token document (the Gopher word-count upper bound) must
    complete in seconds, not minutes — the old kernel was
    O(n_tokens * n_distinct) per row (~3e9 comparisons here)."""
    import time

    from prom_tsdb_copyer_spark.operators.text import repetition_scores

    toks = [f"tok{i % 30000}" for i in range(100_000)]
    df = spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id long, text string"
    )
    t0 = time.monotonic()
    row = repetition_scores(df).collect()[0]
    elapsed = time.monotonic() - t0
    assert row["top_token_ratio"] == round(4 / 100_000, 4)
    assert elapsed < 30, f"long-doc repetition took {elapsed:.1f}s"


def test_chunk_documents_vs_python(spark):
    """Window starts, lengths, indices, and text must equal a sequential
    python chunker; every token covered; tail window short; empty doc
    emits nothing."""
    from prom_tsdb_copyer_spark.operators.text import chunk_documents

    texts = {
        1: " ".join(f"t{i}" for i in range(25)),   # multiple windows
        2: " ".join(f"u{i}" for i in range(8)),    # single window
        3: "one two three four five six seven eight nine ten",  # exact fit
        4: "   ",                                   # empty after trim
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    W, O = 10, 3
    got = {
        (r["doc_id"], r["chunk_idx"]):
            (r["chunk_start"], r["chunk_len"], r["chunk_text"])
        for r in chunk_documents(docs, W, O).collect()
    }

    want = {}
    for did, text in texts.items():
        toks = text.split()
        stride = W - O
        for idx, start in enumerate(range(0, max(len(toks), 1), stride)):
            if start >= len(toks):
                break
            window = toks[start:start + W]
            want[(did, idx)] = (start, len(window), " ".join(window))
    assert got == want
    # coverage: union of windows == full token stream for doc 1
    toks1 = texts[1].split()
    covered = set()
    for (did, _), (start, ln, _) in got.items():
        if did == 1:
            covered.update(range(start, start + ln))
    assert covered == set(range(len(toks1)))


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from prom_tsdb_copyer_spark.operators.text import chunk_documents

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, window_tokens=8, overlap=8)


def test_chunk_documents_no_repeated_tokenize_in_plan(spark):
    """The token array must be projected ONCE (HOF lambda-body rule):
    the plan carries a single split() of the text column."""
    from prom_tsdb_copyer_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(50))) for i in range(4)],
        "doc_id long, text string",
    )
    plan = chunk_documents(docs, 16, 4)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert plan.count("split(") == 1, plan


def test_line_dedup_removes_cross_doc_boilerplate(spark):
    """Lines repeated across >= min_df docs are dropped; unique lines
    and within-doc-only repeats survive; order preserved; counts match
    a python recompute."""
    from prom_tsdb_copyer_spark.operators.text import line_dedup

    banner = "ACCEPT COOKIES TO CONTINUE"
    footer = "(c) example press"
    texts = {
        1: f"{banner}\nalpha one\nbravo two\n{footer}",
        2: f"{banner}\ncharlie three\n{footer}",
        3: f"delta four\ndelta four\necho five",  # within-doc repeat only
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in line_dedup(docs, min_df=2).collect()}

    from collections import Counter
    df_count = Counter()
    for t in texts.values():
        for ln in set(ln.strip() for ln in t.split("\n")):
            df_count[ln] += 1
    boiler = {ln for ln, c in df_count.items() if c >= 2}

    for did, t in texts.items():
        all_lines = t.split("\n")
        keep = [ln for ln in all_lines if ln.strip() not in boiler]
        assert got[did]["n_lines"] == len(all_lines)
        assert got[did]["n_boilerplate"] == sum(
            1 for ln in all_lines if ln.strip() in boiler
        )
        assert got[did]["clean_text"] == "\n".join(keep), did
    assert got[1]["n_boilerplate"] == 2 and got[3]["n_boilerplate"] == 0


def test_line_dedup_keeps_blank_lines(spark):
    """Blank/whitespace-only lines are paragraph STRUCTURE, exempt from
    the repeated-line rule (C4/MassiveText exempt empty lines; ADVICE
    r5 #2): even though every doc contains blank lines (df >= min_df),
    none are stripped -- paragraph breaks survive corpus-wide."""
    from prom_tsdb_copyer_spark.operators.text import line_dedup

    banner = "SUBSCRIBE NOW"
    texts = {
        1: f"{banner}\npara one\n\npara two\n   \npara three",
        2: f"{banner}\nother text\n\nmore text",
        3: "solo doc\n\nwith a break",
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in line_dedup(docs, min_df=2).collect()}
    # only the banner is boilerplate; every blank line is kept verbatim
    for did, t in texts.items():
        keep = [ln for ln in t.split("\n") if ln.strip() != banner]
        assert got[did]["clean_text"] == "\n".join(keep), did
        assert got[did]["n_boilerplate"] == (1 if banner in t else 0)
    assert "\n\n" in got[1]["clean_text"]  # paragraph break survived


def test_scrub_pii_counts_and_redacts(spark):
    from prom_tsdb_copyer_spark.operators.text import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or call +1 (555) 123-4567"),
            (2, "server at 10.0.42.7 answered; backup 192.168.1.254 did not"),
            (3, "no pii here, just text"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert "<EMAIL>" in got[1]["clean_text"]
    assert "<PHONE>" in got[1]["clean_text"]
    assert "jane" not in got[1]["clean_text"]
    assert got[2]["n_ipv4"] == 2
    assert got[2]["clean_text"].count("<IPV4>") == 2
    assert "10.0.42.7" not in got[2]["clean_text"]
    assert got[3]["n_email"] == got[3]["n_phone"] == got[3]["n_ipv4"] == 0
    assert got[3]["clean_text"] == "no pii here, just text"


def test_scrub_pii_rejects_unknown_category(spark):
    import pytest

    from prom_tsdb_copyer_spark.operators.text import scrub_pii

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="unknown"):
        scrub_pii(docs, categories=("email", "ssn"))


def test_resample_mixture_hits_targets_and_is_deterministic(spark):
    """Down-sampling toward a target mix: the binding group is kept in
    full, realized shares land near targets, re-runs are identical,
    and absent keys are dropped."""
    import random

    from pyspark.sql import functions as F

    from prom_tsdb_copyer_spark.operators.text import (
        mixture_weights,
        resample_mixture,
    )

    rnd = random.Random(3)
    rows = []
    for i in range(6000):
        src = ["web", "books", "code", "junk"][
            0 if i % 10 < 6 else 1 if i % 10 < 8 else 2 if i % 10 < 9 else 3
        ]
        rows.append((i, src, rnd.randrange(50, 150)))
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")

    targets = {"web": 0.5, "books": 0.3, "code": 0.2}
    out = resample_mixture(docs, targets, seed=17)
    # deterministic: identical id set on a second run
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in resample_mixture(docs, targets, seed=17)
        .select("doc_id").collect()
    }
    assert ids1 == ids2 and len(ids1) > 0
    # dropped key
    assert out.where("source = 'junk'").count() == 0

    shares = {
        r["key"]: r["share"] for r in mixture_weights(out).collect()
    }
    for k, want in targets.items():
        assert abs(shares[k] - want) < 0.05, (k, shares[k], want)

    # binding group kept in full: code is the most under-target-
    # represented (10% of corpus vs 20% target, ratio 0.5 -- books is
    # 0.2/0.3 = 0.67), so every code doc survives and books is
    # down-sampled to ~75%
    n_code_in = docs.where("source = 'code'").count()
    assert out.where("source = 'code'").count() == n_code_in
    n_books_in = docs.where("source = 'books'").count()
    assert out.where("source = 'books'").count() < n_books_in

    # different seed -> different sample (overwhelmingly likely)
    ids3 = {
        r["doc_id"]
        for r in resample_mixture(docs, targets, seed=99)
        .select("doc_id").collect()
    }
    assert ids3 != ids1


def test_mixture_weights_shares_sum_to_one(spark):
    from prom_tsdb_copyer_spark.operators.text import mixture_weights

    docs = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 30), (3, "b", 60)],
        "doc_id long, source string, n_chars long",
    )
    rows = {r["key"]: r for r in mixture_weights(docs).collect()}
    assert rows["a"]["weight"] == 40 and rows["b"]["weight"] == 60
    assert abs(rows["a"]["share"] - 0.4) < 1e-9
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-6


@pytest.fixture(scope="module")
def lm_docs(spark):
    rows = [
        (0, "the cat sat on the mat and the dog sat too"),
        (1, "the dog and the cat are in the house"),
        (2, "zq9 xv7 qq3 zz8"),  # symbol soup: every token is rare
        (3, "the the the the"),
        (4, ""),
        (5, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mills(x: float) -> int:
    """round(x * 1000) half-away-from-zero (Spark F.round / DuckDB
    round law) -- the PER-ROW quantization the operators apply before
    their exact integer sums (VERDICT r6 #3 discipline)."""
    import math

    return int(math.copysign(math.floor(abs(x) * 1000 + 0.5), x))


def _py_unigram(rows):
    """Pure-python reference: self-trained unigram LM, per-doc
    sum(k * round(ln(cnt/total) * 1000)) -- per-token mills quantized
    BEFORE the (exact integer) sum."""
    import math

    toks = {i: t.lower().split() for i, t in rows}
    counts: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    total = sum(counts.values())
    out = {}
    for i, ts in toks.items():
        mills = sum(_mills(math.log(counts[t] / total)) for t in ts)
        out[i] = (len(ts), mills)
    return out


def test_unigram_logprob_vs_python(spark, lm_docs):
    from prom_tsdb_copyer_spark.operators.text import unigram_logprob

    want = _py_unigram(
        [(r["doc_id"], r["text"]) for r in lm_docs.collect()]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["logp_mills"])
        for r in unigram_logprob(lm_docs).collect()
    }
    assert got == want
    # junk doc scores lower PER TOKEN than natural prose
    per_tok = {i: got[i][1] / got[i][0] for i in (0, 2)}
    assert per_tok[2] < per_tok[0]
    # empty / whitespace-only docs: zero tokens, zero mills
    assert got[4] == (0, 0) and got[5] == (0, 0)


def test_unigram_logprob_external_lm_oov_floor(spark, lm_docs):
    """Scoring against a reference-corpus LM: OOV tokens take the
    floor (min logp - ln 2), in-vocab tokens the LM's logp."""
    import math

    from prom_tsdb_copyer_spark.operators.text import (
        unigram_lm,
        unigram_logprob,
    )

    ref = lm_docs.where("doc_id in (0, 1)")  # LM knows only prose
    lm = unigram_lm(ref)
    lm_rows = {r["token"]: (r["cnt"], r["logp"]) for r in lm.collect()}
    total = sum(c for c, _ in lm_rows.values())
    assert all(
        abs(lp - math.log(c / total)) < 1e-12
        for c, lp in lm_rows.values()
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["logp_mills"])
        for r in unigram_logprob(lm_docs, lm=lm).collect()
    }
    floor = min(lp for _, lp in lm_rows.values()) - math.log(2.0)
    # doc 2: four OOV tokens, each quantized to mills before the sum
    assert got[2] == (4, 4 * _mills(floor))
    s0 = sum(
        _mills(lm_rows[t][1]) if t in lm_rows else _mills(floor)
        for t in "the cat sat on the mat and the dog sat too".split()
    )
    assert got[0] == (11, s0)


def test_unigram_logprob_vs_duckdb(spark, lm_docs):
    """Exactness vs an independent DuckDB implementation (the r7 gate
    rotation candidate's oracle SQL, including empty docs)."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.text import unigram_logprob

    got = {
        r["doc_id"]: (r["n_tokens"], r["logp_mills"])
        for r in unigram_logprob(lm_docs).collect()
    }
    con = duckdb.connect()
    con.register("docs", lm_docs.toPandas())
    sql = r"""
      WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(
                 regexp_split_to_array(trim(lower(text)), '\s+'),
                 t -> t <> '')) AS token
        FROM docs),
      lm AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
      tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM lm),
      dt AS (SELECT doc_id, token, count(*) AS k FROM toks GROUP BY 1, 2),
      agg AS (
        SELECT dt.doc_id,
               CAST(sum(dt.k) AS BIGINT) AS n_tokens,
               CAST(sum(dt.k * CAST(round(ln(lm.cnt / t.total) * 1000)
                                    AS BIGINT))
                    AS BIGINT) AS logp_mills
        FROM dt JOIN lm USING (token) CROSS JOIN tot t
        GROUP BY 1)
      SELECT d.doc_id,
             coalesce(a.n_tokens, 0) AS n_tokens,
             coalesce(a.logp_mills, 0) AS logp_mills
      FROM docs d LEFT JOIN agg a USING (doc_id)
    """
    want = {
        int(i): (int(n), int(m))
        for i, n, m in con.sql(sql).fetchall()
    }
    assert got == want


def test_tfidf_keywords_vs_duckdb(spark, lm_docs):
    """Exactness vs an independent DuckDB implementation (gate-ready
    oracle SQL), plus semantics: a token unique to one doc outranks
    the corpus-wide 'the' there."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.text import tfidf_keywords

    got = {
        (r["doc_id"], r["rank"]): (
            r["keyword"], r["tf"], r["df"], r["tfidf_mills"]
        )
        for r in tfidf_keywords(lm_docs, top_k=3).collect()
    }
    con = duckdb.connect()
    con.register("docs", lm_docs.toPandas())
    sql = r"""
      WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(
                 regexp_split_to_array(trim(lower(text)), '\s+'),
                 t -> t <> '')) AS token
        FROM docs),
      dt AS (SELECT doc_id, token, count(*) AS tf
             FROM toks GROUP BY 1, 2),
      dfr AS (SELECT token, count(*) AS df FROM dt GROUP BY 1),
      nd AS (SELECT count(*) AS n FROM docs),
      scored AS (
        SELECT dt.doc_id, dt.token AS keyword, dt.tf, dfr.df,
               CAST(round(dt.tf * ln(nd.n / dfr.df) * 1000) AS BIGINT)
                 AS tfidf_mills
        FROM dt JOIN dfr USING (token) CROSS JOIN nd)
      SELECT doc_id, keyword, tf, df, tfidf_mills,
             CAST(rank AS INTEGER) AS rank
      FROM (SELECT *, row_number() OVER (
              PARTITION BY doc_id
              ORDER BY tfidf_mills DESC, keyword) AS rank
            FROM scored)
      WHERE rank <= 3
    """
    want = {
        (int(r[0]), int(r[5])): (r[1], int(r[2]), int(r[3]), int(r[4]))
        for r in con.sql(sql).fetchall()
    }
    assert got == want
    # doc 0's top keyword is NOT 'the' (df=3 across docs 0,1,3 kills
    # its idf); rare in-doc tokens win
    assert got[(0, 1)][0] != "the"
    # empty/whitespace docs produce no keyword rows
    assert not any(d in (4, 5) for d, _ in got)


def test_bigram_logprob_vs_python_and_duckdb(spark, lm_docs):
    """Interpolated-bigram scoring: exactness vs a pure-python
    recompute AND an independent DuckDB twin; repeated-context prose
    outscores the same tokens shuffled (what a bigram adds over
    unigram); empty docs (0, 0)."""
    import math

    import duckdb

    from prom_tsdb_copyer_spark.operators.text import bigram_logprob

    lam = 0.7
    rows = [(r["doc_id"], r["text"]) for r in lm_docs.collect()]
    toks = {i: t.lower().split() for i, t in rows}
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    ctx: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    total = sum(uni.values())
    want = {}
    for i, ts in toks.items():
        if not ts:
            want[i] = (0, 0)
            continue
        s = _mills(math.log(uni[ts[0]] / total))
        for a, b in zip(ts, ts[1:]):
            s += _mills(math.log(
                lam * big[(a, b)] / ctx[a] + (1 - lam) * uni[b] / total
            ))
        want[i] = (len(ts), s)
    got = {
        r["doc_id"]: (r["n_tokens"], r["logp_mills"])
        for r in bigram_logprob(lm_docs, lam=lam).collect()
    }
    assert got == want
    # empty / whitespace-only docs: (0 tokens, 0 mills)
    assert got[4] == (0, 0) and got[5] == (0, 0)
    # token counts agree with the tokenizer for every doc
    assert all(got[i][0] == len(toks[i]) for i, _ in rows)

    con = duckdb.connect()
    con.register("docs", lm_docs.toPandas())
    sql = r"""
      WITH base AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                           t -> t <> '') AS tk
        FROM docs),
      toks AS (SELECT doc_id, unnest(tk) AS token FROM base),
      uni AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
      tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM uni),
      pr AS (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(2, greatest(len(tk), 2)),
                 i -> {'prev': tk[i-1], 'w': tk[i]})) AS p
        FROM base WHERE len(tk) >= 2),
      pair_rel AS (SELECT doc_id, p.prev AS prev, p.w AS w FROM pr),
      c2 AS (SELECT prev, w, count(*) AS c2 FROM pair_rel GROUP BY 1, 2),
      c1 AS (SELECT prev, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
      dp AS (SELECT doc_id, prev, w, count(*) AS k
             FROM pair_rel GROUP BY 1, 2, 3),
      body AS (
        SELECT dp.doc_id, dp.k,
               CAST(round(ln(0.7 * (c2.c2 / c1.c1)
                             + 0.3 * exp(ln(uni.cnt / t.total))) * 1000)
                    AS BIGINT) AS lp_mills
        FROM dp JOIN c2 USING (prev, w) JOIN c1 USING (prev)
                JOIN uni ON uni.token = dp.w CROSS JOIN tot t),
      heads AS (
        SELECT b.doc_id, 1 AS k,
               CAST(round(ln(uni.cnt / t.total) * 1000) AS BIGINT)
                 AS lp_mills
        FROM base b JOIN uni ON uni.token = b.tk[1] CROSS JOIN tot t
        WHERE len(b.tk) >= 1),
      agg AS (
        SELECT doc_id,
               CAST(sum(k) AS BIGINT) AS n_tokens,
               CAST(sum(k * lp_mills) AS BIGINT) AS logp_mills
        FROM (SELECT * FROM body UNION ALL SELECT * FROM heads)
        GROUP BY 1)
      SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
             coalesce(a.logp_mills, 0) AS logp_mills
      FROM docs d LEFT JOIN agg a USING (doc_id)
    """
    duck = {int(i): (int(n), int(m)) for i, n, m in con.sql(sql).fetchall()}
    assert got == duck


def test_cap_per_group_vs_duckdb(spark):
    """Per-source cap: at most max_docs survive per group, picks are
    deterministic (lowest-id mode and seeded-hash mode), a re-run is
    byte-identical, and the seeded mode matches an independent DuckDB
    twin of the same xxhash64 rank law... except DuckDB lacks
    xxhash64 -- so the twin checks the INVARIANTS the rank law must
    satisfy (per-group counts, subset-of-group, determinism) and the
    lowest-id mode exactly (gate-ready oracle shape for a future
    rotation: hash mode would gate via the id mode's SQL with the rank
    column exposed)."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.text import cap_per_group

    rows = [(i, f"s{i % 3}", f"text {i}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")

    # lowest-id mode == SQL row_number twin exactly
    got = sorted(
        (r["doc_id"], r["source"])
        for r in cap_per_group(docs, 5, by="source").collect()
    )
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = sorted(
        (int(a), b)
        for a, b in con.sql("""
            SELECT doc_id, source FROM (
              SELECT doc_id, source, row_number() OVER (
                PARTITION BY source ORDER BY doc_id) AS rn
              FROM docs) WHERE rn <= 5
        """).fetchall()
    )
    assert got == want
    assert len(got) == 15

    # seeded mode: exact cap per group, subset of the group, stable
    a = {r["doc_id"] for r in cap_per_group(docs, 4, seed=7).collect()}
    b = {r["doc_id"] for r in cap_per_group(docs, 4, seed=7).collect()}
    assert a == b and len(a) == 12
    # a different seed picks a different (equally sized) subset
    c = {r["doc_id"] for r in cap_per_group(docs, 4, seed=8).collect()}
    assert len(c) == 12 and c != a
    # groups smaller than the cap survive whole
    small = docs.where("doc_id < 3")  # one doc per source
    assert cap_per_group(small, 4, seed=7).count() == 3

    import pytest

    with pytest.raises(ValueError, match="max_docs"):
        cap_per_group(docs, 0)


def test_dsir_weights_vs_duckdb_and_semantics(spark):
    """DSIR importance weights: (a) exactness vs an independent DuckDB
    recompute (same hash60 % B bucketing, add-one smoothing, per-row
    mills quantization -- gate-ready oracle SQL), (b) semantics: raw
    docs resembling the target corpus outscore junk, (c) empty docs
    score (0, 0)."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.text import dsir_weights

    target = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and looked at the dog"),
            (1, "a dog and a cat lived in the little house"),
            (2, "the house had a mat and the cat liked it"),
        ],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (10, "the cat and the dog sat in the house"),   # target-like
            (11, "zq9 xv7 qq3 zz8 kk2 jj5"),                # junk
            (12, "buy now cheap pills zz8 qq3 click here"), # junkish
            (13, ""),                                        # empty
        ],
        "doc_id long, text string",
    )
    B = 512
    got = {
        r["doc_id"]: (r["n_feats"], r["llr_mills"])
        for r in dsir_weights(raw, target, n_buckets=B).collect()
    }
    # semantics: per-feature mean ratio separates target-like from junk
    per = {i: got[i][1] / max(got[i][0], 1) for i in (10, 11, 12)}
    assert per[10] > per[11] and per[10] > per[12]
    assert got[13] == (0, 0)

    con = duckdb.connect()
    con.register("raw", raw.toPandas())
    con.register("tgt", target.toPandas())

    def feats(table):
        return rf"""
          SELECT doc_id,
                 ('0x' || substr(md5(f), 1, 15))::BIGINT % {B} AS bucket,
                 count(*) AS k
          FROM (
            SELECT doc_id, unnest(list_concat(tk,
                     CASE WHEN len(tk) >= 2 THEN
                       list_transform(generate_series(2, len(tk)),
                         i -> tk[i-1] || ' ' || tk[i])
                     ELSE [] END)) AS f
            FROM (SELECT doc_id,
                         list_filter(regexp_split_to_array(
                           trim(lower(text)), '\s+'), t -> t <> '') AS tk
                  FROM {table}))
          GROUP BY 1, 2
        """

    sql = f"""
      WITH rf AS ({feats('raw')}), tf AS ({feats('tgt')}),
      q AS (SELECT bucket, sum(k) AS qc FROM rf GROUP BY 1),
      p AS (SELECT bucket, sum(k) AS pc FROM tf GROUP BY 1),
      qt AS (SELECT sum(qc) AS t FROM q),
      pt AS (SELECT sum(pc) AS t FROM p),
      ratio AS (
        SELECT coalesce(q.bucket, p.bucket) AS bucket,
               CAST(round((ln((coalesce(pc, 0) + 1) / (pt.t + {B}))
                         - ln((coalesce(qc, 0) + 1) / (qt.t + {B})))
                         * 1000) AS BIGINT) AS lr_mills
        FROM q FULL JOIN p ON q.bucket = p.bucket
        CROSS JOIN qt CROSS JOIN pt),
      agg AS (
        SELECT rf.doc_id, CAST(sum(rf.k) AS BIGINT) AS n_feats,
               CAST(sum(rf.k * ratio.lr_mills) AS BIGINT) AS llr_mills
        FROM rf JOIN ratio USING (bucket) GROUP BY 1)
      SELECT r.doc_id, coalesce(a.n_feats, 0), coalesce(a.llr_mills, 0)
      FROM raw r LEFT JOIN agg a USING (doc_id)
    """
    want = {int(i): (int(n), int(m)) for i, n, m in con.sql(sql).fetchall()}
    assert got == want


def test_dsir_resample_deterministic_fraction(spark):
    """The Gumbel-top-k selection keeps ~fraction of the corpus, is
    byte-identical across runs for one seed, prefers target-like docs
    in aggregate, and validates its fraction."""
    import pytest

    from prom_tsdb_copyer_spark.operators.text import dsir_resample

    # target comparable in size to raw: add-one smoothing floors are
    # balanced (a tiny target vs a huge raw corpus inflates every
    # unseen-feature ratio -- the paper's setting is two large corpora)
    target = spark.createDataFrame(
        [(i, "the cat sat on the mat near the dog and the house "
             f"t{i}") for i in range(30)],
        "doc_id long, text string",
    )
    # 30 target-like + 30 junk raw docs
    rows = [(i, "the cat and the dog sat on the mat " + f"v{i}")
            for i in range(30)]
    rows += [(100 + i, f"zq{i} xv{i} qq{i} zz{i} kk{i}")
             for i in range(30)]
    raw = spark.createDataFrame(rows, "doc_id long, text string")

    kept = dsir_resample(raw, target, fraction=0.5, n_buckets=256,
                         seed=3)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    again = {r["doc_id"] for r in dsir_resample(
        raw, target, fraction=0.5, n_buckets=256, seed=3
    ).select("doc_id").collect()}
    assert ids == again
    assert 18 <= len(ids) <= 42  # ~half (Gumbel noise + approx thresh)
    # importance sampling prefers the target-like half in aggregate
    assert len([i for i in ids if i < 100]) > len(ids) / 2
    with pytest.raises(ValueError, match="fraction"):
        dsir_resample(raw, target, fraction=0.0)


def test_dsir_resample_empty_corpus_and_open_interval(spark):
    """ADVICE r7: (a) an empty raw corpus short-circuits (percentile
    of zero rows is NULL; the old where(__g >= NULL) silently emitted
    zero rows of a misleading plan) -- result is simply empty; (b) the
    hash->uniform map lands strictly inside (0, 1): (pmod + 0.5)/2^40
    can never hit u == 1, where -ln(-ln(1)) NULLs out and the doc
    would be silently DROPPED against the Gumbel limit. Structural
    check: every raw doc survives fraction=1.0 (a NULL noise score
    would fail the >= threshold filter and lose its doc)."""
    from prom_tsdb_copyer_spark.operators.text import dsir_resample

    target = spark.createDataFrame(
        [(0, "the cat sat"), (1, "a dog ran")],
        "doc_id long, text string",
    )
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dsir_resample(empty, target, fraction=0.5).count() == 0

    raw = spark.createDataFrame(
        [(i, f"doc number {i} words here") for i in range(50)],
        "doc_id long, text string",
    )
    kept = dsir_resample(raw, target, fraction=1.0, n_buckets=64)
    assert kept.count() == 50  # no doc silently dropped to a NULL gumbel


def test_dsir_weights_registry_pins_featurization(spark):
    """ADVICE r7: the raw featurization feeds both the q model and the
    scoring join -- with a cache_registry the pinned relation is handed
    back (and is really persisted) so the explode+agg runs once."""
    from prom_tsdb_copyer_spark.operators.text import dsir_weights

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {i}") for i in range(10)],
        "doc_id long, text string",
    )
    reg = []
    out = dsir_weights(docs, docs, n_buckets=32, cache_registry=reg)
    assert out.count() == 10
    assert len(reg) == 1 and reg[0].storageLevel.useMemory
    for c in reg:
        c.unpersist()


def test_perplexity_buckets_rank_vs_duckdb(spark):
    """CCNet head/middle/tail split, rank mode, against an independent
    DuckDB twin of the whole law -- the per-token micro-nat floor, the
    per-language (pt DESC, id) ranking, the floor(n*f) cut points, and
    the zero-token -> tail rule. Integer algebra end to end (r9 gate
    fuel)."""
    import duckdb

    from prom_tsdb_copyer_spark.operators.text import perplexity_buckets

    rows = [
        # (doc_id, lang, n_tokens, logp_mills): two languages with
        # enough docs that every bucket is non-empty, a tie pair, and
        # a zero-token doc
        (i, lang, n, lp)
        for i, (lang, n, lp) in enumerate(
            [
                ("en", 10, -25_000), ("en", 20, -30_000),
                ("en", 10, -80_000), ("en", 5, -60_000),
                ("en", 8, -16_000), ("en", 10, -25_000),
                ("en", 0, 0), ("fr", 4, -10_000),
                ("fr", 10, -90_000), ("fr", 7, -35_000),
                ("fr", 9, -36_000), ("fr", 3, -33_000),
            ]
        )
    ]
    scored = spark.createDataFrame(
        rows, "doc_id long, lang string, n_tokens long, logp_mills long"
    )
    got = {
        r["doc_id"]: (r["lang"], r["pt_micros"], r["bucket"])
        for r in perplexity_buckets(scored, lang_col="lang").collect()
    }

    con = duckdb.connect()
    con.register("scored", scored.toPandas())
    want = {
        int(d): (lg, None if p is None else int(p), b)
        for d, lg, p, b in con.sql("""
            WITH pt AS (
              SELECT doc_id, lang,
                     CASE WHEN n_tokens > 0 THEN
                       floor(logp_mills * 1000.0 / n_tokens)::BIGINT
                     END AS pt_micros
              FROM scored),
            r AS (
              SELECT *,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY pt_micros DESC NULLS LAST, doc_id
                     ) AS rn,
                     count(*) OVER (PARTITION BY lang) AS cnt
              FROM pt)
            SELECT doc_id, lang, pt_micros,
                   CASE WHEN pt_micros IS NULL THEN 'tail'
                        WHEN rn <= floor(cnt / 3.0) THEN 'head'
                        WHEN rn <= floor(cnt * 2.0 / 3.0) THEN 'middle'
                        ELSE 'tail' END AS bucket
            FROM r
        """).fetchall()
    }
    assert got == want and len(want) == 12
    assert {b for _, _, b in got.values()} == {"head", "middle", "tail"}
    assert got[6][2] == "tail"  # zero-token doc


def test_perplexity_buckets_threshold_mode_and_pipeline(spark, docs):
    """Threshold (scale) mode: no window over the corpus; buckets
    monotone in pt_micros within a language; fractions approximately
    honored; agrees with rank mode away from cut boundaries. Also runs
    the composed pipeline shape: unigram_logprob -> buckets."""
    from prom_tsdb_copyer_spark.operators.text import (
        perplexity_buckets,
        unigram_logprob,
    )

    scored = unigram_logprob(docs)
    out = perplexity_buckets(scored, mode="threshold").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {0, 1, 2, 3, 4}
    assert by_id[4]["bucket"] == "tail"  # empty doc
    order = {"head": 2, "middle": 1, "tail": 0}
    ranked = sorted(
        (r for r in out if r["pt_micros"] is not None),
        key=lambda r: -r["pt_micros"],
    )
    lvls = [order[r["bucket"]] for r in ranked]
    assert lvls == sorted(lvls, reverse=True)  # monotone in quality

    rank_out = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(scored, mode="rank").collect()
    }
    # the best-scored doc must be head in BOTH modes at n=4 scored docs
    assert rank_out[ranked[0]["doc_id"]] == "head"
    assert by_id[ranked[0]["doc_id"]]["bucket"] == "head"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        perplexity_buckets(scored, mode="nope")
    with _pytest.raises(ValueError):
        perplexity_buckets(scored, fractions=(0.8, 0.2))
