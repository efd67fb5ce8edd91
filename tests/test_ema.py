"""EMA semantics tests (reference: Ema/ema.py:29-105 warm-up + shadow update)."""

import jax
import jax.numpy as jnp
import numpy as np

from sd_tpu.core.ema import ema_copy_to, ema_init, ema_update


def test_warmup_decay_schedule():
    params = {"w": jnp.zeros(3)}
    st = ema_init(params, decay=0.9999)
    # after first update n=1 → decay = min(0.9999, 2/11); shadow moves by (1-d)
    st = ema_update(st, {"w": jnp.ones(3)})
    d = 2.0 / 11.0
    np.testing.assert_allclose(np.asarray(st.shadow["w"]), 1.0 - d, rtol=1e-6)


def test_no_warmup():
    params = {"w": jnp.zeros(3)}
    st = ema_init(params, decay=0.5, use_num_updates=False)
    st = ema_update(st, {"w": jnp.ones(3)})
    np.testing.assert_allclose(np.asarray(st.shadow["w"]), 0.5)


def test_converges_to_params():
    st = ema_init({"w": jnp.zeros(())}, decay=0.5, use_num_updates=False)
    for _ in range(50):
        st = ema_update(st, {"w": jnp.ones(())})
    assert abs(float(st.shadow["w"]) - 1.0) < 1e-9


def test_copy_to_preserves_dtype():
    params = {"w": jnp.ones(3, dtype=jnp.bfloat16)}
    st = ema_init(params)
    assert st.shadow["w"].dtype == jnp.float32
    out = ema_copy_to(st, params)
    assert out["w"].dtype == jnp.bfloat16


def test_jit_compatible():
    st = ema_init({"w": jnp.zeros(4)})
    step = jax.jit(ema_update)
    st2 = step(st, {"w": jnp.ones(4)})
    assert int(st2.num_updates) == 1
