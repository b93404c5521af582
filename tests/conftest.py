import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from planetiler_openmaptiles_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    from planetiler_openmaptiles_spark.datagen import write_corpus

    out = tmp_path_factory.mktemp("corpus")
    return write_corpus(str(out), n_docs=800, seed=42)
