"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that the multi-chip sharding
path (parallel/) is exercised without TPU hardware.  The env vars must be set
before jax is first imported anywhere in the test process.
"""

import os
import sys

# The axon TPU tunnel registers a PJRT plugin via a PYTHONPATH sitecustomize
# in every python process; with it loaded, even CPU-backend device->host
# transfers hang for minutes.  Tests must run on a clean local CPU backend,
# and the sitecustomize has already run by the time conftest is imported, so
# re-exec pytest once with a sanitized environment.  The re-exec happens in
# pytest_configure (below) so the capture manager can first restore the real
# stdout/stderr fds — at conftest import they already point into pytest's
# capture files, which would silently swallow the re-exec'd run's output.
_NEEDS_SANITIZED_REEXEC = (
    ".axon_site" in os.environ.get("PYTHONPATH", "")
    and os.environ.get("CSPC_TESTS_SANITIZED") != "1"
)


def pytest_configure(config):
    if not _NEEDS_SANITIZED_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["CSPC_TESTS_SANITIZED"] = "1"
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


import pathlib as _pathlib
import sys as _sys

_REPO_ROOT = _pathlib.Path(__file__).resolve().parent.parent
if str(_REPO_ROOT) not in _sys.path:
    _sys.path.insert(0, str(_REPO_ROOT))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# The persistent compilation cache is DISABLED for the suite: in full-suite
# accumulation state (~150 compiled executables, never in any subset),
# XLA:CPU's executable serialize() SIGABRTs on write and deserialize
# segfaults on read — observed at tests/test_streaming.py with stacks in
# jax compilation_cache put/get_executable_and_time.  The suite's keys
# change with the code under test anyway, so the cache saved little; CLI
# and tool runs keep their own caches (utils.cache).
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
# jax also enables a DEFAULT persistent cache at ~/.cache/jax — the kill
# switch below is the only reliable off (observed: crashes continued with
# only the env dir removed, stack still in compilation_cache get/put)
os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1000000"
# The AOT executable cache (utils.cache.aot_call) uses the same XLA:CPU
# serialize path that crashes in full-suite accumulation state — off by
# default here; tests/test_aot_cache.py opts in explicitly for its own
# isolated roundtrip checks.
os.environ.setdefault("CSPC_AOT", "0")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
