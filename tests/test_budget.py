"""Token-budget selection (sampling.select_token_budget): exact set
equality against a pure-Python re-derivation of the bucket + boundary
hash-draw spec, plus degenerate cases and validation."""

import hashlib
import math

import pytest

from deidcm_spark.operators.sampling import select_token_budget

B = 256  # small bucket count so the boundary bucket holds several docs
SEED = 0


def _key(doc_id, seed=SEED):
    return int(hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:15], 16)


def oracle_select(rows, budget, n_buckets=B):
    """rows = [(doc_id, score, n_toks)] -> set of selected doc_ids."""
    scored = [r for r in rows if r[1] is not None]
    if not scored:
        return set()
    lo = min(r[1] for r in scored)
    hi = max(r[1] for r in scored)
    span = hi - lo

    def bkt(s):
        if span == 0:
            return 0
        return min(int(math.floor((s - lo) / span * n_buckets)), n_buckets - 1)

    totals = {}
    for d, s, t in scored:
        totals[bkt(s)] = totals.get(bkt(s), 0) + t
    acc, boundary, remaining = 0, None, 0
    selected = set()
    for b in sorted(totals, reverse=True):
        if acc + totals[b] <= budget:
            acc += totals[b]
            selected |= {d for d, s, t in scored if bkt(s) == b}
        else:
            boundary, remaining = b, budget - acc
            break
    if boundary is not None and remaining > 0:
        bdocs = sorted(
            (r for r in scored if bkt(r[1]) == boundary),
            key=lambda r: (_key(r[0]), r[0]),
        )
        before = 0
        for d, s, t in bdocs:
            if before < remaining:
                selected.add(d)
            before += t
    return selected


def mk_rows(n):
    # deterministic scores with heavy ties so buckets hold multiple docs
    return [
        (i, round((i * 37 % 100) / 100.0, 2), 10 + (i * 13 % 50)) for i in range(n)
    ]


@pytest.fixture(scope="module")
def budget_df(spark):
    rows = mk_rows(500)
    return spark.createDataFrame(
        [(d, s, t, f"doc {d}") for d, s, t in rows],
        "doc_id bigint, score double, n_toks bigint, text string",
    )


def _select_ids(df, budget):
    return {
        r.doc_id
        for r in select_token_budget(
            df, budget, score_col="score", token_col="n_toks", n_buckets=B
        ).collect()
    }


def test_budget_matches_oracle_mid_corpus(spark, budget_df):
    rows = mk_rows(500)
    total = sum(t for _, _, t in rows)
    for budget in (total // 10, total // 3, total - 1):
        got = _select_ids(budget_df, budget)
        want = oracle_select(rows, budget)
        assert got == want, budget
        # the straddler rule: total may exceed budget by < one max doc
        picked = sum(t for d, s, t in rows if d in got)
        assert picked <= budget + max(t for _, _, t in rows)


def test_budget_selects_high_scores_first(spark, budget_df):
    rows = mk_rows(500)
    got = _select_ids(budget_df, sum(t for _, _, t in rows) // 10)
    in_scores = sorted((s for d, s, t in rows if d in got))
    out_scores = sorted((s for d, s, t in rows if d not in got), reverse=True)
    # every wholly-selected bucket outranks every wholly-dropped bucket:
    # only boundary-bucket ties can interleave, so the score gap between
    # the worst selected and best dropped is at most one bucket width
    assert in_scores[0] >= out_scores[0] - (1.0 / B) - 1e-9


def test_budget_all_fit_and_all_tied(spark):
    rows = [(i, 0.5, 10) for i in range(100)]  # all scores equal
    df = spark.createDataFrame(
        [(d, s, t, "x") for d, s, t in rows],
        "doc_id bigint, score double, n_toks bigint, text string",
    )
    assert _select_ids(df, 10_000) == set(range(100))  # budget >= total


def test_budget_boundary_join_not_force_broadcast(spark):
    """r3 verdict #1: in the all-tied degenerate case the boundary prefix
    IS the whole selected set, so the semi-join must not carry a forced
    broadcast hint — size-based planning (AQE) only."""
    rows = [(i, 0.5, 10) for i in range(200)]  # one bucket holds everything
    df = spark.createDataFrame(
        [(d, s, t, "x") for d, s, t in rows],
        "doc_id bigint, score double, n_toks bigint, text string",
    )
    out = select_token_budget(df, 500, token_col="n_toks", seed=SEED)
    optimized = out._jdf.queryExecution().optimizedPlan().toString()
    # the bounded block->offset broadcast inside _prefix_tokens
    # (<= max_blocks rows by construction) is legitimate and stays; the
    # unbounded doc_id LeftSemi must carry no hint
    semi_lines = [ln for ln in optimized.splitlines() if "LeftSemi" in ln]
    assert semi_lines, optimized
    assert not any("strategy=broadcast" in ln for ln in semi_lines), semi_lines
    # correctness unchanged: budget lands mid-bucket, 50 docs selected
    assert out.count() == 50
    got = _select_ids(df, 305)
    assert got == oracle_select(rows, 305)
    assert len(got) == 31  # 30 fill 300, the straddler is included


def test_budget_null_scores_excluded(spark):
    df = spark.createDataFrame(
        [(1, 0.9, 10, "a"), (2, None, 10, "b"), (3, 0.1, 10, "c")],
        "doc_id bigint, score double, n_toks bigint, text string",
    )
    assert _select_ids(df, 1000) == {1, 3}
    all_null = df.filter("score is null")
    assert (
        select_token_budget(all_null, 10, score_col="score", token_col="n_toks").count()
        == 0
    )


def test_budget_null_token_counts_excluded(spark):
    """Rows with NULL token counts (a left-join miss from a token-count
    table) are unselectable: previously a bucket whose rows all had NULL
    counts summed to a NULL total and crashed the driver walk with
    TypeError, and a selected NULL corrupted downstream accounting."""
    df = spark.createDataFrame(
        [(1, 0.9, 10, "a"), (2, 0.9, None, "b"), (3, 0.1, 10, "c"),
         # a whole score bucket of NULL counts (the crash case)
         (4, 0.5, None, "d"), (5, 0.5, None, "e")],
        "doc_id bigint, score double, n_toks bigint, text string",
    )
    out = select_token_budget(df, 1000, score_col="score",
                              token_col="n_toks", n_buckets=B)
    rows = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    assert rows == {1: 10, 3: 10}  # NULL-count rows never selected


def test_budget_default_tokenizer_and_validation(spark, budget_df):
    out = select_token_budget(budget_df, 200, score_col="score", n_buckets=B)
    # whitespace tokenizer: every "doc N" text is 2 tokens
    assert out.count() > 0
    assert {r.n_tokens for r in out.collect()} == {2}
    with pytest.raises(ValueError, match="budget_tokens"):
        select_token_budget(budget_df, 0, score_col="score")


def test_budget_deterministic(spark, budget_df):
    a = _select_ids(budget_df, 3000)
    b = _select_ids(budget_df, 3000)
    assert a == b


def test_budget_token_col_named_n_tokens(spark):
    # a precomputed count column literally named n_tokens must survive
    # the boundary-bucket re-count (internal column collision guard)
    rows = [(i, (i % 10) / 10.0, 10, "x") for i in range(200)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, score double, n_tokens bigint, text string"
    )
    out = select_token_budget(
        df, 505, score_col="score", token_col="n_tokens", n_buckets=B
    )
    assert out.columns.count("n_tokens") == 1
    got = {r.doc_id for r in out.collect()}
    want = oracle_select([(d, s, t) for d, s, t, _ in rows], 505)
    assert got == want


def test_mix_duplicate_names_rejected(spark):
    df = spark.range(5).selectExpr("id as doc_id", "'t' as text")
    from deidcm_spark.operators.sampling import mix_corpora

    with pytest.raises(ValueError, match="unique"):
        mix_corpora([("web", df, 1.0), ("web", df, 0.5)])
