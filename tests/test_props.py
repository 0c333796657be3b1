"""Property-based algebraic invariants (SURVEY §5.5) on generated frames.

Small-data, high-coverage checks of the engine's building blocks: these hold
for ANY input, so hypothesis shrinks violations to minimal counterexamples.
Example counts are kept low — each example round-trips through the JVM.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=0,
    max_size=30,
)

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def make_df(spark, rows):
    return spark.createDataFrame(rows or [(0, 0.0, "a")], "k int, v float, tag string")


@given(rows=rows_strategy)
@SETTINGS
def test_filter_project_commute(spark, rows):
    df = make_df(spark, rows)
    a = df.filter(F.col("k") > 2).select("k", (F.col("v") * 2).alias("w"))
    b = df.select("k", (F.col("v") * 2).alias("w")).filter(F.col("k") > 2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@given(rows=rows_strategy)
@SETTINGS
def test_union_counts_add(spark, rows):
    df = make_df(spark, rows)
    assert df.unionByName(df).count() == 2 * df.count()


@given(rows=rows_strategy)
@SETTINGS
def test_dedup_idempotent(spark, rows):
    df = make_df(spark, rows)
    once = df.dropDuplicates(["k", "tag"])
    twice = once.dropDuplicates(["k", "tag"])
    assert once.count() == twice.count()
    assert once.count() == df.select("k", "tag").distinct().count()


@given(rows=rows_strategy)
@SETTINGS
def test_window_topk_subset_of_global_sort(spark, rows):
    from pyspark.sql import Window

    df = make_df(spark, rows)
    w = Window.partitionBy("tag").orderBy(F.col("v").desc(), F.col("k").asc())
    topk = df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 2)
    global_rows = {tuple(r) for r in df.collect()}
    assert all(tuple(r)[:3] in global_rows for r in topk.collect())
    # per-tag count is min(2, group size)
    sizes = {r["tag"]: r["n"] for r in df.groupBy("tag").agg(F.count("*").alias("n")).collect()}
    got = {r["tag"]: r["n"] for r in topk.groupBy("tag").agg(F.count("*").alias("n")).collect()}
    assert all(got[t] == min(2, n) for t, n in sizes.items() if t in got)


@given(
    vec=st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=1,
        max_size=16,
    )
)
@SETTINGS
def test_cosine_self_similarity_is_one(spark, vec):
    if all(abs(x) < 1e-6 for x in vec):
        return  # zero vector: cosine undefined
    from upflow_spark.pipeline.similarity import _cos, _unit

    df = spark.createDataFrame([(vec,)], "emb array<float>")
    got = df.select(_cos(_unit("emb"), _unit("emb")).alias("c")).collect()[0]["c"]
    assert abs(got - 1.0) < 1e-9


def test_entropy_bounds(spark, sf_dir):
    """0 <= char entropy <= ln(distinct chars) for every document."""
    import math

    from upflow_spark import QUERIES

    rows = QUERIES["text_char_entropy"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1e-9 <= r["char_entropy"] <= math.log(r["n_distinct_chars"]) + 1e-6, r


def test_temperature_weights_normalize(spark, sf_dir):
    """Sampling weights are a distribution and order languages by volume."""
    from upflow_spark import QUERIES

    rows = QUERIES["sample_temperature_weights"](spark, sf_dir).collect()
    assert abs(sum(r["sample_weight"] for r in rows) - 1.0) < 5e-4  # r4 rounding
    by_tokens = sorted(rows, key=lambda r: r["lang_tokens"])
    by_weight = sorted(rows, key=lambda r: r["sample_weight"])
    assert [r["lang"] for r in by_tokens] == [r["lang"] for r in by_weight]


def test_pack_bins_are_budgeted(spark, sf_dir):
    """Every bin except a language's last holds < 2048 + one-doc overflow."""
    from upflow_spark import QUERIES

    rows = QUERIES["pack_token_bins"](spark, sf_dir).collect()
    assert rows
    last_bin = {}
    for r in rows:
        last_bin[r["lang"]] = max(last_bin.get(r["lang"], -1), r["bin_id"])
    bins_of = {}
    for r in rows:
        bins_of.setdefault(r["lang"], set()).add(r["bin_id"])
    for lang, bins in bins_of.items():
        # bin ids are contiguous from 0 (cumsum-derived, no gaps)
        assert bins == set(range(last_bin[lang] + 1)), (lang, sorted(bins))
    # bin b's docs occupy cumsum range [first-start, next bin's first-start):
    # a bin underflows 2048 only by the previous bin's overflow and overflows
    # only by its own last doc — both bounded by one document's tokens
    max_doc = 2048  # corpus docs are well under one budget
    for r in rows:
        if r["bin_id"] < last_bin[r["lang"]]:
            assert 2048 - max_doc < r["bin_tokens"] < 2048 + max_doc, r


def test_decontaminate_counts_are_consistent(spark, sf_dir):
    from upflow_spark import QUERIES

    rows = QUERIES["curation_decontaminate"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_contaminated"] + r["n_kept"] == r["n_docs"], r


def _union_find_labels(edges):
    """Reference CC: plain union-find, label = min of component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def _star_cc(spark, edges):
    from upflow_spark.pipeline.cluster import _cc_star_fixpoint

    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in _cc_star_fixpoint(df).collect()
    }
    want = _union_find_labels(edges)
    assert set(got) == set(want)
    for n, lbl in want.items():
        assert got[n] == (lbl, n == lbl), (n, got[n], lbl)


def test_star_cc_adversarial_chain(spark):
    """256-node path graph: diameter 255 — min-label propagation's worst
    case. Star alternation must still resolve every node to min label 0,
    and do it in O(log² n) rounds (bounded directly below)."""
    edges = [(i, i + 1) for i in range(255)]
    _star_cc(spark, edges)


def test_star_cc_round_bound_on_chain(spark):
    """The alternation itself (not the wrapper) stabilizes a 256-node chain
    within c·log²(n) double-rounds — the Kiveris et al. bound with slack;
    a linear-diameter algorithm would need ~255."""
    from pyspark.sql import functions as F

    from upflow_spark.pipeline.cluster import _large_star, _small_star

    e = spark.createDataFrame(
        [(i + 1, i) for i in range(255)], "u long, v long"
    ).localCheckpoint()
    rounds = 0
    for _ in range(40):
        e2 = _small_star(_large_star(e)).localCheckpoint()
        rounds += 1
        if e2.exceptAll(e).isEmpty() and e.exceptAll(e2).isEmpty():
            break
        e = e2
    assert rounds <= 16, rounds  # log2(256)=8; paper bound O(log^2 n), c small
    # fixpoint is the min-centered star: every node links straight to 0
    assert {(r["u"], r["v"]) for r in e2.collect()} == {(i, 0) for i in range(1, 256)}


def test_star_cc_random_graphs(spark):
    """Random sparse graphs (mixed cliques, chains, isolated pairs) against
    the union-find reference."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = []
        # a chain segment
        edges += [(i, i + 1) for i in range(0, 12)]
        # a clique on [20, 26)
        edges += [(a, b) for a in range(20, 26) for b in range(a + 1, 26)]
        # random edges among [30, 60)
        for _ in range(25):
            a, b = rng.randrange(30, n), rng.randrange(30, n)
            if a != b:
                edges.append((a, b))
        rng.shuffle(edges)
        _star_cc(spark, edges)


def test_star_cc_matches_production_fixpoint(spark, sf_dir):
    """Both CC implementations agree label-for-label on the real SimHash
    pair graph — the alternation is a drop-in behind the same contract."""
    from upflow_spark.pipeline.cluster import _cc_star_fixpoint, dedup_cluster_cc
    from upflow_spark.pipeline.dedup import dedup_simhash_pairs

    pairs = dedup_simhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    star = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in _cc_star_fixpoint(pairs).collect()
    }
    prod = {
        (r["doc_id"], r["cluster_id"], r["is_canonical"])
        for r in dedup_cluster_cc(spark, sf_dir).collect()
    }
    assert star == prod


# --- r6: GEMM pair-kernel equivalence on arbitrary corpora -------------

docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["apple", "bear", "cat", "dog", "elm", "fox", "gnu"]),
        min_size=0,
        max_size=6,
    ),
    min_size=0,
    max_size=12,
)


def _brute_pairs(term_lists, threshold, measure):
    """Reference implementation: python set arithmetic over all pairs."""
    sets = {i: set(t) for i, t in enumerate(term_lists)}
    out = set()
    for a in sets:
        for b in sets:
            inter = len(sets[a] & sets[b])
            if measure == "containment":
                if a == b or not sets[a]:
                    continue
                if inter / len(sets[a]) >= threshold:
                    out.add((a, b))
            else:
                if a >= b:
                    continue
                union = len(sets[a] | sets[b])
                if union and inter / union >= threshold:
                    out.add((a, b))
    return out


@given(term_lists=docs_strategy)
@SETTINGS
def test_gemm_kernel_matches_brute_force(spark, term_lists):
    """The distributed blocked-GEMM kernel (r6: distributively packed
    B matrix, A side streamed from the source) must emit exactly the
    brute-force pair set for BOTH measures on any corpus — including
    empty corpora, empty-term docs (0/0 never passes), and all-duplicate
    corpora."""
    from upflow_spark.pipeline.dedup import _jaccard_pairs_gemm

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(term_lists)] or [(0, ["x"])],
        "doc_id long, terms array<string>",
    )
    lists = term_lists or [["x"]]
    for measure, thr in (("jaccard", 0.5), ("containment", 0.8)):
        got = {
            (r["doc_a"], r["doc_b"])
            for r in _jaccard_pairs_gemm(spark, docs, thr, measure=measure).collect()
        }
        assert got == _brute_pairs(lists, thr, measure), (measure, lists)


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),
        st.integers(min_value=0, max_value=60),
    ),
    min_size=1,
    max_size=80,
)


@given(edges=edges_strategy)
@settings(max_examples=25, deadline=None)
def test_cc_contraction_cte_matches_union_find(edges):
    """The generated pointer-doubling oracle (r7: replaced the recursive
    transitive closure that ran hours at sf0.1) must agree with a
    union-find on ANY graph — hypothesis shrinks violations to minimal
    edge lists. Pure DuckDB, no Spark."""
    import duckdb

    from upflow_spark.pipeline.cluster import _cc_contraction_cte

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    nodes = sorted({x for e in edges for x in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in nodes}

    con = duckdb.connect()
    con.execute("CREATE TABLE pairs (doc_a BIGINT, doc_b BIGINT)")
    con.executemany("INSERT INTO pairs VALUES (?, ?)", edges)
    got = dict(
        con.execute(
            f"WITH {_cc_contraction_cte()} SELECT n, lbl FROM cc_final"
        ).fetchall()
    )
    con.close()
    assert got == want


def test_cc_contraction_cte_ascending_chain():
    """The adversarial case that broke the first r7 draft: an ascending-id
    chain makes the hop forest a single max-depth path, so insufficient
    pointer jumps contract ADDITIVELY and labels never converge. Pin a
    chain longer than any contraction round could shift additively."""
    import duckdb

    from upflow_spark.pipeline.cluster import _cc_contraction_cte

    n = 3000
    con = duckdb.connect()
    con.execute("CREATE TABLE pairs (doc_a BIGINT, doc_b BIGINT)")
    con.executemany(
        "INSERT INTO pairs VALUES (?, ?)", [(i, i + 1) for i in range(1, n)]
    )
    got = con.execute(
        f"WITH {_cc_contraction_cte()} SELECT count(*) FROM cc_final WHERE lbl = 1"
    ).fetchone()[0]
    con.close()
    assert got == n


def test_cc_contraction_cte_poisons_on_nonconvergence():
    """r8 ADVICE guard: with the round budget forced too small for the
    graph, the oracle must emit the (-1, -1) poison row — never a
    plausible-but-wrong labelling. A 100-node ascending chain with
    rounds=1, jumps=1 cannot contract fully; and the SAME graph with the
    production budget must converge with NO poison row."""
    import duckdb

    from upflow_spark.pipeline.cluster import _cc_contraction_cte

    n = 100
    con = duckdb.connect()
    con.execute("CREATE TABLE pairs (doc_a BIGINT, doc_b BIGINT)")
    con.executemany(
        "INSERT INTO pairs VALUES (?, ?)", [(i, i + 1) for i in range(1, n)]
    )
    poisoned = con.execute(
        f"WITH {_cc_contraction_cte(rounds=1, jumps=1)} "
        "SELECT count(*) FROM cc_final WHERE n = -1"
    ).fetchone()[0]
    clean = con.execute(
        f"WITH {_cc_contraction_cte()} "
        "SELECT count(*) FROM cc_final WHERE n = -1"
    ).fetchone()[0]
    con.close()
    assert poisoned == 1, "undersized budget must poison the output"
    assert clean == 0, "production budget must converge with no poison row"


def _py_kcore(pairs, k):
    """Reference synchronous peeling in plain python."""
    import collections

    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    nodes = set(adj)
    while True:
        rem = {n for n in nodes if sum(1 for m in adj[n] if m in nodes) < k}
        if not rem:
            break
        nodes -= rem
    return {n: sum(1 for m in adj[n] if m in nodes) for n in nodes}


def test_kcore_peel_matches_reference_on_adversarial_shapes(spark):
    """The Spark peeling loop must agree with plain-python synchronous
    peeling on shapes that stress it differently: a chain (everything
    peels), a clique (nothing peels), a barbell (bridge peels away), and a
    clique with pendant tails (cascading removal)."""
    from pyspark.sql import functions as F

    from upflow_spark.pipeline.cluster import _kcore_peel

    clique = [(i, j) for i in range(10, 16) for j in range(10, 16) if i < j]
    shapes = {
        "chain": [(i, i + 1) for i in range(30)],
        "clique6": clique,
        "barbell": clique
        + [(i, j) for i in range(20, 26) for j in range(20, 26) if i < j]
        + [(15, 20)],
        "tails": clique + [(15, 100), (100, 101), (101, 102)],
    }
    for name, pairs in shapes.items():
        ref = _py_kcore(pairs, 4)
        edges = (
            spark.createDataFrame(pairs, "u: long, v: long")
            .select("u", "v")
            .unionByName(
                spark.createDataFrame(
                    [(b, a) for a, b in pairs], "u: long, v: long"
                )
            )
            .distinct()
        )
        got = {
            r["doc_id"]: r["core_degree"]
            for r in _kcore_peel(spark, edges, k=4, rounds=8).collect()
        }
        assert -1 not in got, f"{name}: unconverged within budget"
        assert got == ref, f"{name}: {got} != {ref}"


def test_kcore_poison_fires_on_undersized_budget(spark):
    """A 0-round budget leaves sub-k nodes in place — the poison row must
    appear instead of silently plausible output (the ADVICE-r7 rule)."""
    from upflow_spark.pipeline.cluster import _kcore_peel

    pairs = [(i, i + 1) for i in range(10)]  # chain: 4-core is empty
    edges = (
        spark.createDataFrame(pairs, "u: long, v: long")
        .unionByName(
            spark.createDataFrame([(b, a) for a, b in pairs], "u: long, v: long")
        )
        .distinct()
    )
    rows = _kcore_peel(spark, edges, k=4, rounds=0).collect()
    assert any(r["doc_id"] == -1 for r in rows), "poison row missing"


def test_zorder_interleave_formula_is_a_morton_bijection():
    """The shared Morton formula (DuckDB spelling evaluates as plain
    python) must reproduce the reference bit-interleave for every bucket
    pair — and therefore be a bijection onto 0..255."""
    from upflow_spark.sources.manifest import ZBITS, _z_formula

    def ref(xb, yb):
        z = 0
        for i in range(ZBITS):
            z |= ((xb >> i) & 1) << (2 * i + 1)
            z |= ((yb >> i) & 1) << (2 * i)
        return z

    seen = set()
    for xb in range(1 << ZBITS):
        for yb in range(1 << ZBITS):
            z = eval(_z_formula(str(xb), str(yb), "//"))
            assert z == ref(xb, yb), (xb, yb)
            seen.add(z)
    assert seen == set(range(1 << (2 * ZBITS)))


def test_kcore_converges_past_old_budget_depth(spark):
    """Forced-deep-peel fixture (VERDICT r10 item 4): a pendant cascade of
    depth 12 — anchor clique K10, pendant chain g1..g12 where g1 leans on
    3 clique members and every other g_i on 2, so exactly one chain node
    drops below k=4 per synchronous round. The convergence loop must peel
    all 12 layers WITHOUT poison (the old fixed 8-round budget could not)
    and land on the reference core."""
    from upflow_spark.pipeline.cluster import _kcore_peel

    m = 12
    clique = [(i, j) for i in range(100, 110) for j in range(100, 110) if i < j]
    chain = [(i, i + 1) for i in range(1, m)]  # g1..g12 as 1..12
    pads = [(1, 100), (1, 101), (1, 102)]
    for i in range(2, m + 1):
        pads += [(i, 100 + (2 * i) % 10), (i, 100 + (2 * i + 1) % 10)]
    pairs = clique + chain + pads
    ref = _py_kcore(pairs, 4)
    assert all(n >= 100 for n in ref), "cascade must fully peel"
    edges = (
        spark.createDataFrame(pairs, "u: long, v: long")
        .unionByName(
            spark.createDataFrame([(b, a) for a, b in pairs], "u: long, v: long")
        )
        .distinct()
    )
    # depth check against the python reference: >8 synchronous rounds needed
    import collections

    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    nodes, depth = set(adj), 0
    while True:
        rem = {n for n in nodes if sum(1 for x in adj[n] if x in nodes) < 4}
        if not rem:
            break
        nodes -= rem
        depth += 1
    assert depth > 8, f"fixture not deep enough: {depth}"

    got = {r["doc_id"]: r["core_degree"] for r in _kcore_peel(spark, edges).collect()}
    assert -1 not in got, "poison fired on a convergent graph"
    assert got == ref
