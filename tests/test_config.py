"""YAML config surface (reference convert.py:185-224 / utils.py:30-89
UX parity): load, validate, reject unknown keys, round-trip, and one
end-to-end job run driven entirely by a config file."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from pdfwf_spark.config import ExtractConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_from_yaml_defaults_and_overrides(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("input: /in.parquet\noutput: /out\nbuckets: 128\n"
                 "markdown_compat: true\n")
    cfg = ExtractConfig.from_yaml(p)
    assert cfg.buckets == 128 and cfg.markdown_compat is True
    assert cfg.salts == 64 and cfg.resume is True    # defaults survive


def test_from_yaml_rejects_unknown_keys(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("input: /a\noutput: /b\nbucketz: 9\n")
    with pytest.raises(ValueError, match="unknown config keys.*bucketz"):
        ExtractConfig.from_yaml(p)


def test_validation():
    with pytest.raises(ValueError, match="non-empty"):
        ExtractConfig(input="", output="/o")
    with pytest.raises(ValueError, match="prepartition"):
        ExtractConfig(input="/i", output="/o", prepartition="sometimes")
    with pytest.raises(ValueError, match="buckets"):
        ExtractConfig(input="/i", output="/o", buckets=0)


def test_yaml_round_trip(tmp_path):
    cfg = ExtractConfig(input="/i.parquet", output="/o", buckets=32,
                        limit=100, markdown_compat=True)
    p = tmp_path / "rt.yaml"
    cfg.to_yaml(p)
    assert ExtractConfig.from_yaml(p) == cfg


def test_config_file_drives_job_end_to_end(spark, tmp_path):
    """The reference's production path: one YAML file, no other flags."""
    from pdfwf_spark.fixtures.gen import gen_transcripts
    from pdfwf_spark.schemas import TRANSCRIPT_SCHEMA

    inp = str(tmp_path / "in.parquet")
    out = str(tmp_path / "out")
    rows = [{k: v for k, v in r.items() if not k.startswith("_")}
            for r in gen_transcripts(10, seed=3, mega_every=0)]
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).write.parquet(inp)

    cfg = tmp_path / "job.yaml"
    cfg.write_text(f"input: {inp}\noutput: {out}\nbuckets: 8\nsalts: 4\n"
                   "partitions: 4\nmarkdown_compat: true\n")
    env = dict(os.environ, PYTHONPATH=REPO)
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "run_extract.py"),
         "--config", str(cfg)],
        capture_output=True, text=True, env=env, timeout=240,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.strip().splitlines() if l.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["input_rows"] > 0 and stats["ok_rows"] > 0
    assert os.path.isdir(f"{out}/turns") and os.path.isdir(f"{out}/lineage")
