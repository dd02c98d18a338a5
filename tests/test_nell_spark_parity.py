"""Full-NELL parity through the DISTRIBUTED path: Spark candidate generation
feeding the driver greedy must reproduce the reference's exact rule set and
MDL bits (``tests/goldens_nell.json``, captured from the reference run).

The oracle-path equivalents live in test_nell_parity.py; this file proves the
Spark candidate aggregation + scan-order replay are bit-exact at real scale,
not just on the inline fixtures.
"""

import hashlib
import json
import zipfile
from pathlib import Path

import pytest

from tests.conftest import NELL_ZIP

pytestmark = [pytest.mark.nell, pytest.mark.spark]

GOLDENS = Path(__file__).parent / "goldens_nell.json"


@pytest.fixture(scope="module")
def nell_dir(tmp_path_factory):
    if not NELL_ZIP.exists():
        pytest.skip("reference NELL dataset not available")
    target = tmp_path_factory.mktemp("nell_spark")
    with zipfile.ZipFile(NELL_ZIP) as z:
        z.extractall(target)
    return target


def test_spark_path_reproduces_reference_model(spark, nell_dir):
    from kgist_spark.oracle.engine import ModelEvaluator
    from kgist_spark.plans.summarizer import SparkSummarizer
    from kgist_spark.sources.edgelist import load_labels, load_triples

    golden = json.loads(GOLDENS.read_text())
    summ = SparkSummarizer(
        load_triples(spark, str(nell_dir / "nell.txt")),
        load_labels(spark, str(nell_dir / "nell_labels.txt")),
        idify=True,
    )
    model = summ.fit(passes=2, label_qualify=True)
    kg = summ.index

    assert len(model.rules) == golden["n_rules"]
    rules = sorted(repr(kg.tuplify(r)) for r in model.rules)
    assert hashlib.sha256("\n".join(rules).encode()).hexdigest() == golden["rule_set_sha256"]
    val, mlen, ne, nn = ModelEvaluator(kg).evaluate(model, with_lengths=True)
    assert abs(val - golden["bits_total"]) < 1e-4
    assert abs(mlen - golden["bits_model"]) < 1e-4
