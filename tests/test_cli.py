"""spark-submit CLI entry (S33 parity: cmd/root.go:174-238)."""

import json
import os

from gleaner_spark.__main__ import main
from gleaner_spark.sources import corpus

CONFIG_YAML = """
minio:
  bucket: gleanerbucket
summoner:
  threads: 5
  delay: 0
  mode: full
sources:
{sources}
"""


def _write_fixtures(spark, tmpdir: str, n: int = 300) -> dict:
    pages_dir = os.path.join(tmpdir, "pages")
    corpus.build_pages(spark, n, partitions=4).write.mode("overwrite").parquet(pages_dir)
    seeds = {
        "sitemaps": corpus.build_sitemaps(n),
        "robots": corpus.build_robots(),
    }
    seeds_path = os.path.join(tmpdir, "seeds.json")
    with open(seeds_path, "w") as f:
        json.dump(seeds, f)
    src_lines = []
    for s in corpus.build_sources():
        src_lines.append(
            f"  - name: {s.name}\n    url: {s.url}\n    sourcetype: {s.source_type}\n"
            f"    domain: {s.domain}\n    pid: {s.pid or 'pid:' + s.name}\n"
            f"    propername: {s.proper_name or s.name}\n    active: 'true'"
        )
    cfg_path = os.path.join(tmpdir, "cfg.yaml")
    with open(cfg_path, "w") as f:
        f.write(CONFIG_YAML.format(sources="\n".join(src_lines)))
    return {"pages": pages_dir, "seeds": seeds_path, "cfg": cfg_path}


def test_cli_full_run(spark, tmp_lake, tmp_path, capsys):
    fx = _write_fixtures(spark, str(tmp_path))
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--setup", "--run-id", "cli-1",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["run_id"] == "cli-1"
    assert out["new_documents"] > 0
    assert out["fetched"] > 0
    assert out["errors"] == []
    # lake tables materialized
    for t in ("documents", "prov", "orgs", "frontier", "metrics"):
        assert os.path.isdir(os.path.join(tmp_lake, t))


def test_cli_diff_mode_fatal(spark, tmp_lake, tmp_path, capsys):
    fx = _write_fixtures(spark, str(tmp_path), n=10)
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--mode", "diff",
    ])
    assert rc == 1
    assert "not supported" in capsys.readouterr().err


def test_cli_unknown_source(spark, tmp_lake, tmp_path, capsys):
    fx = _write_fixtures(spark, str(tmp_path), n=10)
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--source", "nope",
    ])
    assert rc == 1


def test_cli_single_source_and_resume(spark, tmp_lake, tmp_path, capsys):
    fx = _write_fixtures(spark, str(tmp_path), n=200)
    name = corpus.build_sources()[0].name
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--source", name, "--run-id", "cli-s",
    ])
    assert rc == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["new_documents"] > 0
    rc = main([
        "--cfg", fx["cfg"], "--pages", fx["pages"], "--seeds", fx["seeds"],
        "--lake", tmp_lake, "--source", name, "--run-id", "cli-s", "--resume",
    ])
    assert rc == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["new_documents"] == 0  # phases checkpointed → skipped


def test_cli_rude_requires_source(tmp_path, capsys):
    """root.go:106-109: --rude without --source is an error."""
    from gleaner_spark.__main__ import main

    rc = main([
        "--cfg", "x.yaml", "--pages", "p", "--lake", str(tmp_path),
        "--seeds", "s.json", "--rude",
    ])
    assert rc == 1
    assert "rude is only valid" in capsys.readouterr().err
