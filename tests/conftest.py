import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(ray_session, tmp_path_factory):
    """Small deterministic corpus + its partitioned statement store."""
    from yago4_ray.corpus import materialize_corpus

    return materialize_corpus(n_entities=600, seed=42)


@pytest.fixture(scope="session")
def statements_root(corpus_dir, tmp_path_factory):
    import ray.data

    from yago4_ray.sources import write_statement_store

    root = str(tmp_path_factory.mktemp("store") / "statements")
    ds = ray.data.read_parquet(os.path.join(corpus_dir, "statements.parquet"))
    write_statement_store(ds, root)
    return root
