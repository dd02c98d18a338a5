"""Reference-format CLI (python -m kgist_spark) mirrors reference main.py:
the CLI run on the `test` fixture must produce the same rules.txt as the
library path, including with -Rm/-Rn refinements."""

import subprocess
import sys

import pytest

from kgist_spark.oracle import GreedySearcher
from kgist_spark.sources.model_io import save_model
from tests.conftest import FIXTURES, fixture_kg


def _run_cli(tmp_path, *extra):
    out = tmp_path / "cli_out"
    cmd = [
        sys.executable, "-m", "kgist_spark",
        "--graph", str(FIXTURES / "test.txt"),
        "--output_path", str(out), "-v", "0", *extra,
    ]
    subprocess.run(cmd, check=True, cwd="/root/repo", timeout=300)
    return (out / "rules.txt").read_text()


def test_cli_matches_library(tmp_path):
    kg = fixture_kg("test", idify=True)
    model = GreedySearcher(kg).build_model(passes=2, label_qualify=True)
    lib_out = tmp_path / "lib_out"
    save_model(model, str(lib_out))
    want = (lib_out / "rules.txt").read_text()
    assert _run_cli(tmp_path) == want


def test_cli_refinements(tmp_path):
    from kgist_spark.oracle.refine import merge_rules, nest_rules

    kg = fixture_kg("test", idify=True)
    model = nest_rules(merge_rules(GreedySearcher(kg).build_model()))
    lib_out = tmp_path / "lib_rmrn"
    save_model(model, str(lib_out))
    want = (lib_out / "rules.txt").read_text()
    assert _run_cli(tmp_path, "-Rm", "-Rn") == want


@pytest.mark.spark
def test_cli_candidate_save_load_roundtrip(tmp_path):
    """S3 via the CLI: --save_candidates persists the contribution table,
    and a second run with --load_candidates (skipping candidate generation)
    produces an identical model."""
    cand_path = tmp_path / "cands.parquet"
    first = _run_cli(tmp_path, "--save_candidates", str(cand_path))
    assert cand_path.exists()
    out2 = tmp_path / "cli_out2"
    cmd = [
        sys.executable, "-m", "kgist_spark",
        "--graph", str(FIXTURES / "test.txt"),
        "--output_path", str(out2), "-v", "0",
        "--load_candidates", str(cand_path),
    ]
    subprocess.run(cmd, check=True, cwd="/root/repo", timeout=300)
    assert (out2 / "rules.txt").read_text() == first


def test_cli_no_idify(tmp_path):
    kg = fixture_kg("test", idify=False)
    model = GreedySearcher(kg).build_model()
    lib_out = tmp_path / "lib_raw"
    save_model(model, str(lib_out))
    assert _run_cli(tmp_path, "--idify", "false") == (lib_out / "rules.txt").read_text()
