"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths can
be exercised without TPU hardware (the standard JAX trick, SURVEY.md
§4.4). Uses jax.config (not env vars) because this environment's
sitecustomize pre-registers an `axon` TPU plugin and parses XLA_FLAGS
before conftest runs, so JAX_PLATFORMS / XLA_FLAGS edits here would be
ignored.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


_EXIT_STATUS = [0]


def pytest_sessionfinish(session, exitstatus):
    _EXIT_STATUS[0] = int(exitstatus)


def pytest_unconfigure(config):
    # The axon PJRT relay (registered by sitecustomize in every python
    # process) can leave non-daemon threads that stall interpreter exit
    # for minutes. Flush and exit hard once pytest is fully done (this
    # hook runs after the terminal summary).
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        import sys

        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(_EXIT_STATUS[0])
