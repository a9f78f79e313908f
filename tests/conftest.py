import importlib.util
import os
import sys

import pytest

# Lance test stub (tests/_lance_stub/lance.py): activated ONLY when no
# real pylance is importable, and BEFORE ray.init so Ray worker
# processes inherit the PYTHONPATH and resolve `import lance` to the
# stub too.  With real pylance installed this block is inert and the
# lance tests exercise the real library instead.
_LANCE_STUB = os.path.join(os.path.dirname(__file__), "_lance_stub")
if importlib.util.find_spec("lance") is None:
    sys.path.insert(0, _LANCE_STUB)
    os.environ["PYTHONPATH"] = (
        _LANCE_STUB + os.pathsep + os.environ.get("PYTHONPATH", ""))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()
