"""Trace-analysis helper behind BENCH's per-component fields (VERDICT r4
next #3): trace_op_breakdown must parse a jax.profiler xplane dump and
attribute device time to op groups by name substring."""

import jax
import jax.numpy as jnp
import pytest


def test_trace_op_breakdown(tmp_path):
    pytest.importorskip("tensorflow", reason="xplane proto parser needs tf")
    from rangeldm_tpu.utils.profiling import trace_op_breakdown

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x) @ x

    x = jnp.ones((256, 256), jnp.float32)
    jax.block_until_ready(f(x))
    jax.profiler.start_trace(str(tmp_path))
    y = x
    for _ in range(3):
        y = f(y)
    jax.block_until_ready(y)
    jax.profiler.stop_trace()

    bd = trace_op_breakdown(str(tmp_path),
                            groups={"matmul": ("dot_general", "dot."),
                                    "nothing": ("no_such_op_name",)})
    assert bd["total_ms"] > 0
    assert bd["groups"]["matmul"] > 0          # the two dots dominate
    assert bd["groups"]["nothing"] == 0
    assert bd["groups"]["matmul"] <= bd["total_ms"]
    assert bd["top_ops"] and bd["top_ops"][0][1] >= bd["top_ops"][-1][1]
    # CPU backend: host-plane fallback is expected and flagged by name
    assert bd["plane"].startswith(("/device:", "/host:"))


def test_trace_op_breakdown_missing_dir(tmp_path):
    pytest.importorskip("tensorflow")
    from rangeldm_tpu.utils.profiling import trace_op_breakdown
    with pytest.raises(FileNotFoundError):
        trace_op_breakdown(str(tmp_path / "nope"))
