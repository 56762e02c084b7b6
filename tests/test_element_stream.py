"""Pallas streaming executor for the element path (ops/element_stream).

Interpret-mode correctness against the scipy oracle and the XLA executor,
plus layout/padding invariants.  Hardware throughput is probed separately
(tools/probe_pallas_stream.py) and benchmarked in bench.py.
"""

import numpy as np
import pytest

from spada_tpu.io.workloads import (localized_powerlaw_csr, powerlaw_csr,
                                    random_csr)
from spada_tpu.ops.element import (build_esc_plan, esc_operands, esc_execute,
                                   esc_values_host)
from spada_tpu.ops.element_stream import (build_stream_layout,
                                          stream_execute_fn,
                                          stream_operands, stream_to_csr,
                                          stream_values_host)


def _oracle(a, b):
    return np.asarray((a.to_scipy() @ b.to_scipy()).todense())


CASES = [
    ("uniform", random_csr(60, 80, 0.08, seed=1, dtype=np.float32),
     random_csr(80, 50, 0.08, seed=2, dtype=np.float32)),
    ("powerlaw", powerlaw_csr(300, 300, 5.0, seed=3, dtype=np.float32),
     powerlaw_csr(300, 300, 5.0, seed=4, dtype=np.float32)),
    ("loc-powerlaw",
     localized_powerlaw_csr(512, 512, 12.0, seed=5, dtype=np.float32),
     localized_powerlaw_csr(512, 512, 12.0, seed=6, dtype=np.float32)),
    ("dense-ish", random_csr(48, 48, 0.6, seed=7, dtype=np.float32),
     random_csr(48, 48, 0.6, seed=8, dtype=np.float32)),
]


@pytest.mark.parametrize("name,a,b", CASES, ids=[c[0] for c in CASES])
def test_stream_matches_scipy(name, a, b):
    import jax.numpy as jnp

    plan = build_esc_plan(a, b)
    layout = build_stream_layout(plan)
    ops = stream_operands(layout, plan, a, b)
    run = stream_execute_fn(layout, interpret=True)
    vals = run(tuple((jnp.asarray(av), jnp.asarray(bv)) for av, bv in ops))
    got = stream_to_csr(layout, vals)
    np.testing.assert_allclose(
        got.todense(), _oracle(a, b), rtol=1e-4, atol=1e-4
    )


def test_stream_values_match_xla_executor():
    """Unpadded chunk values equal the XLA executor's, class by class."""
    a, b = CASES[2][1], CASES[2][2]
    plan = build_esc_plan(a, b)
    xla_vals = esc_values_host(esc_execute(esc_operands(plan, a, b)))

    import jax.numpy as jnp

    layout = build_stream_layout(plan)
    ops = stream_operands(layout, plan, a, b)
    run = stream_execute_fn(layout, interpret=True)
    padded = stream_values_host(
        run(tuple((jnp.asarray(av), jnp.asarray(bv)) for av, bv in ops)))
    # strip per-class padding and compare
    got_parts, base_p, base_u = [], 0, 0
    for bk, c in zip(plan.buckets, layout.classes):
        got_parts.append(padded[base_p : base_p + c["n"]])
        pad_tail = padded[base_p + c["n"] : base_p + c["n_pad"]]
        assert np.all(pad_tail == 0.0)
        base_p += c["n_pad"]
        base_u += c["n"]
    np.testing.assert_allclose(np.concatenate(got_parts), xla_vals,
                               rtol=1e-6, atol=1e-7)


def test_layout_geometry_invariants():
    a, b = CASES[1][1], CASES[1][2]
    plan = build_esc_plan(a, b)
    layout = build_stream_layout(plan)
    assert layout.nnz_c == plan.nnz_c
    assert len(layout.esc_to_csr) == sum(c["n_pad"] for c in layout.classes)
    for c in layout.classes:
        assert c["n_pad"] >= c["n"]
        if c["L"] == 1:
            assert c["rows"] % c["br"] == 0
            assert c["n_pad"] == c["rows"] * 1024
        else:
            assert c["n_pad"] % c["chl"] == 0
            assert c["chl"] % 128 == 0
    # padded byte model >= the unpadded plan's
    assert layout.operand_bytes() >= plan.operand_bytes()


def test_spgemm_element_backend_routing():
    """backend='pallas' routes spgemm_element through the stream executor
    (interpret mode off-TPU) and matches scipy, incl. the row-slab path."""
    from spada_tpu.config import SpadaConfig
    from spada_tpu.ops.element import EscSlabbedResult, spgemm_element
    from spada_tpu.ops.element_stream import StreamResult
    from spada_tpu.ops.spgemm import spgemm

    a, b = CASES[0][1], CASES[0][2]
    res = spgemm_element(a, b, backend="pallas")
    assert isinstance(res, StreamResult)
    np.testing.assert_allclose(res.todense(), _oracle(a, b),
                               rtol=1e-4, atol=1e-4)

    cfg = SpadaConfig(element_backend="pallas")
    res2 = spgemm(a, b, cfg, dataflow="element")
    np.testing.assert_allclose(res2.todense(), _oracle(a, b),
                               rtol=1e-4, atol=1e-4)

    # slab path carries the backend through
    a3, b3 = CASES[2][1], CASES[2][2]
    res3 = spgemm_element(a3, b3, backend="pallas", max_slab_products=2000)
    assert isinstance(res3, EscSlabbedResult)
    assert all(isinstance(p, StreamResult) for p in res3.parts)
    np.testing.assert_allclose(res3.todense(), _oracle(a3, b3),
                               rtol=1e-4, atol=1e-4)


def test_backend_auto_resolution():
    """'auto' -> pallas on TPU, xla elsewhere (tests run on CPU)."""
    import jax

    from spada_tpu.ops.element import resolve_element_backend

    expect = "pallas" if jax.default_backend() == "tpu" else "xla"
    assert resolve_element_backend("auto") == expect
    assert resolve_element_backend("xla") == "xla"
    assert resolve_element_backend("pallas") == "pallas"


def test_empty_plan():
    from spada_tpu.sparse.csr import CsrMatrix

    z = CsrMatrix((4, 4), np.zeros(5, np.int64), [], [])
    plan = build_esc_plan(z, z)
    layout = build_stream_layout(plan)
    run = stream_execute_fn(layout, interpret=True)
    got = stream_to_csr(layout, run(()))
    assert got.nnz == 0
