"""Triangle counting: known graphs, orientation correctness under skewed
degrees, and determinism."""

from ocr_spark.operators.link_graph import triangle_counts


def edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src_host string, dst_host string"
    )


def as_map(df):
    return {r.host: (r.degree, r.n_triangles, r.clustering_milli) for r in df.collect()}


def test_single_triangle(spark):
    got = as_map(triangle_counts(edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])))
    assert got == {"a": (2, 1, 1000), "b": (2, 1, 1000), "c": (2, 1, 1000)}


def test_k4_every_node_in_three(spark):
    vs = ["a", "b", "c", "d"]
    pairs = [(x, y) for i, x in enumerate(vs) for y in vs[i + 1 :]]
    got = as_map(triangle_counts(edges(spark, pairs)))
    assert all(got[v] == (3, 3, 1000) for v in vs)


def test_pendant_and_directions_collapse(spark):
    # duplicate/reversed directed edges collapse to one undirected edge;
    # the pendant node closes no triangle
    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("c", "d")]
    got = as_map(triangle_counts(edges(spark, pairs)))
    assert got["a"] == (2, 1, 1000)
    assert got["b"] == (2, 1, 1000)
    assert got["c"][0] == 3 and got["c"][1] == 1
    assert got["c"][2] == (1000 * 2 * 1) // (3 * 2)
    assert got["d"] == (1, 0, 0)


def test_hub_skew_counts_exactly(spark):
    # star hub + one rim edge: exactly one triangle despite the hub's
    # degree; the rim edge orients INTO the hub-closed wedge correctly
    pairs = [("hub", f"s{i}") for i in range(20)] + [("s3", "s7")]
    got = as_map(triangle_counts(edges(spark, pairs)))
    assert got["hub"][1] == 1 and got["s3"][1] == 1 and got["s7"][1] == 1
    assert sum(t for _, t, _ in got.values()) == 3  # one triangle, 3 hosts


def test_deterministic_under_repartition(spark):
    pairs = [(f"h{i}", f"h{(i * i + 1) % 13}") for i in range(60)]
    a = sorted(map(tuple, triangle_counts(edges(spark, pairs)).collect()))
    b = sorted(
        map(
            tuple,
            triangle_counts(edges(spark, pairs).repartition(5, "dst_host")).collect(),
        )
    )
    assert a == b


def test_kcore_peels_pendants_and_cascades(spark):
    from ocr_spark.operators.link_graph import kcore_hosts

    # ring a-b-c-a survives k=2; pendant chain d-e hangs off c and peels
    # in CASCADE (e first, then d)
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    got = {r.host: r.core_degree for r in kcore_hosts(edges(spark, pairs)).collect()}
    assert got == {"a": 2, "b": 2, "c": 2}


def test_kcore_empty_when_forest(spark):
    from ocr_spark.operators.link_graph import kcore_hosts

    # a tree has no 2-core at all
    pairs = [("r", "x"), ("r", "y"), ("x", "z")]
    assert kcore_hosts(edges(spark, pairs)).collect() == []


def test_textrank_hub_word_ranks_highest(spark):
    from ocr_spark.operators.link_graph import pagerank_hosts

    # star co-occurrence: 'hub' adjacent to many distinct words
    e = []
    for i in range(8):
        e += [("hub", f"w{i}"), (f"w{i}", "hub")]
    ranks = {
        r.host: r.rank for r in pagerank_hosts(edges(spark, e), n_iters=4).collect()
    }
    assert ranks["hub"] == max(ranks.values())


def test_random_walks_follow_edges_and_truncate(spark):
    from ocr_spark.operators.link_graph import random_walks

    pairs = [("a", "b"), ("b", "c")]  # c is a dead end
    got = random_walks(edges(spark, pairs), walk_len=4).collect()
    adjacency = {"a": {"b"}, "b": {"c"}}
    for r in got:
        hops = r.walk.split(">")
        assert hops[0] == r.host
        for u, v in zip(hops, hops[1:]):
            assert v in adjacency.get(u, set()), r.walk
    # walks from a reach c and stop (a>b>c); walks from c are just 'c'
    assert {r.walk for r in got if r.host == "a"} == {"a>b>c"}
    assert {r.walk for r in got if r.host == "c"} == {"c"}


def test_random_walks_deterministic(spark):
    from ocr_spark.operators.link_graph import random_walks

    pairs = [(f"h{i}", f"h{(i * 5 + 1) % 9}") for i in range(30)]
    a = sorted(map(tuple, random_walks(edges(spark, pairs)).collect()))
    b = sorted(
        map(
            tuple,
            random_walks(edges(spark, pairs).repartition(6, "dst_host")).collect(),
        )
    )
    assert a == b
    # two walks per start node
    assert len(a) == 2 * len({x for p in pairs for x in p})
