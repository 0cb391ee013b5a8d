"""Sanity checks for the test environment (CPU, 8 virtual devices)."""

import jax
import jax.numpy as jnp


def test_virtual_cpu_mesh_available():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    assert len(devs) == 8


def test_basic_op():
    assert float(jnp.ones((4, 4)).sum()) == 16.0
