import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

FIXTURES = Path(__file__).resolve().parent / "fixtures"

# the reference NELL dataset (read-only, optional: tests that need it skip
# when absent so the repo remains standalone)
NELL_ZIP = Path("/root/reference/data/nell.zip")


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
