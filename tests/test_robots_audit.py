"""Post-crawl robots/blocklist compliance audit: clean on real engine
output, and flags planted violations with the exact rule."""

import json

import pyarrow as pa
import pyarrow.parquet as pq

from newscrawler_ray.pipelines.crawl import robots_compliance_audit, run_crawl
from newscrawler_ray.synth import gen_fixtures


def test_engine_output_is_compliant_and_plants_are_flagged(ray_session, tmp_path):
    fx = gen_fixtures("/tmp/newscrawler_ray_fixtures/audit_1k", n_urls=1000, seed=42)
    out = tmp_path / "crawl"
    run_crawl(fx, out, n_seen_shards=2, n_frontier_shards=2, checkpoint=False)
    assert robots_compliance_audit(out, fx).count() == 0

    # plant: a disallowed path on a robots host + a blocklisted host
    pol = pq.read_table(fx / "politeness.parquet").to_pylist()
    rh = next(r for r in pol if r["robots_disallow"])
    prefix = list(rh["robots_disallow"])[0]
    blocked_host = sorted(json.loads((fx / "config.json").read_text())["blocklist"])[0]
    wave = out / "waves" / "wave=9999"
    wave.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "url": [
                    f"http://{rh['host']}{prefix}evil",
                    f"http://{blocked_host}/p/1",
                ],
                "host": [rh["host"], blocked_host],
            }
        ),
        str(wave / "part-planted.parquet"),
    )
    df = (
        robots_compliance_audit(out, fx)
        .to_pandas()
        .sort_values("rule", ignore_index=True)
    )
    assert len(df) == 2
    assert df.rule[0] == "blocklist" and df.host[0] == blocked_host
    assert df.rule[1] == f"disallow:{prefix}" and df.host[1] == rh["host"]
