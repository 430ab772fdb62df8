import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def synth_table():
    from ptrail_ray.sources.transcripts import synth_transcripts

    return synth_transcripts(n_convs=60, mean_turns=12, n_hot=1, hot_turns=600, seed=11)


@pytest.fixture(scope="session")
def synth_ds(synth_table):
    import ray.data as rd

    return rd.from_arrow(synth_table)


@pytest.fixture(scope="session")
def synth_pdf(synth_table):
    return synth_table.to_pandas()
