"""Frontier shard semantics: politeness budgets, pop order, degenerate shards."""

import ray


def test_pop_respects_per_host_budget(ray_session):
    from newscrawler_ray.state.frontier import FrontierShard

    shard = FrontierShard.remote(0, {"hot.com": 1000}, default_interval_ms=2000)
    urls = [f"http://hot.com/p/{i}" for i in range(50)] + [
        f"http://cold.com/p/{i}" for i in range(5)
    ]
    hosts = ["hot.com"] * 50 + ["cold.com"] * 5
    prios = list(range(55))
    ray.get(shard.push.remote(urls, hosts, prios, [0] * 55, list(range(55))))

    # window 10s: hot.com (1s interval) releases 10; cold.com (2s) releases 5
    t = ray.get(shard.pop_wave.remote(10_000))
    by_host = {}
    for h in t.column("host").to_pylist():
        by_host[h] = by_host.get(h, 0) + 1
    assert by_host == {"hot.com": 10, "cold.com": 5}
    # virtual clocks advanced by count * interval
    clocks = ray.get(shard.host_clocks.remote())
    assert clocks["hot.com"] == 10 * 1000
    assert clocks["cold.com"] == 5 * 2000

    # release order within a host: priority DESC, then url ASC
    hot_prios = [
        p
        for p, h in zip(t.column("priority").to_pylist(), t.column("host").to_pylist())
        if h == "hot.com"
    ]
    assert hot_prios == sorted(hot_prios, reverse=True)
    ray.kill(shard)


def test_pop_tiebreak_url_asc(ray_session):
    from newscrawler_ray.state.frontier import FrontierShard

    shard = FrontierShard.remote(0, {}, default_interval_ms=1000)
    urls = ["http://a.com/z", "http://a.com/b", "http://a.com/m"]
    ray.get(shard.push.remote(urls, ["a.com"] * 3, [7, 7, 7], [0] * 3, [1, 2, 3]))
    t = ray.get(shard.pop_wave.remote(10_000))
    assert t.column("url").to_pylist() == sorted(urls)
    ray.kill(shard)


def test_single_shard_crawl_matches_oracle(ray_session, fixture_dir, tmp_path_factory):
    from newscrawler_ray.oracle import run_oracle
    from newscrawler_ray.pipelines.crawl import crawl_order, run_crawl

    out = tmp_path_factory.mktemp("crawl_single") / "out"
    res = run_crawl(
        fixture_dir, out, n_seen_shards=1, n_frontier_shards=1, checkpoint=False
    )
    o = run_oracle(fixture_dir)
    assert res["seen"] == o.seen
    assert crawl_order(out) == o.order
    assert res["makespan_ms"] == o.makespan_ms
