import os
import sys
import tempfile
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

# fixture graphs live inline in tests/fixture_data.py and are rendered to a
# temp directory once per test run (loaders want file paths)
_FIXTURE_TMP = Path(tempfile.mkdtemp(prefix="kgist_fixtures_"))
FIXTURES = _FIXTURE_TMP

# the reference NELL dataset (read-only, optional: tests that need it skip
# when absent so the repo remains standalone)
NELL_ZIP = Path("/root/reference/data/nell.zip")


def _render_fixture_files():
    from tests.fixture_data import GRAPHS

    for name, g in GRAPHS.items():
        (_FIXTURE_TMP / f"{name}.txt").write_text("\n".join(g["edges"]) + "\n")
        (_FIXTURE_TMP / f"{name}_labels.txt").write_text("\n".join(g["labels"]) + "\n")


_render_fixture_files()


def fixture_kg(name: str, idify: bool = False):
    from kgist_spark.oracle.kg import LocalKG

    return LocalKG.from_files(
        str(FIXTURES / f"{name}.txt"), str(FIXTURES / f"{name}_labels.txt"), idify=idify
    )


@pytest.fixture(scope="session")
def spark():
    from kgist_spark.session import get_spark

    spark = get_spark(app_name="kgist-tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "4")))
    yield spark
