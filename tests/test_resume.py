"""Training checkpoint/resume tests."""

import numpy as np
import optax

from tmat_tpu.models import train as T
from tmat_tpu.models.unet import build_unet_xception


def test_train_state_resume_bitexact(tmp_path, rng):
    model, variables = build_unet_xception(1, (32, 32), channels=1,
                                           filter_counts=(8, 16))
    tx = optax.adam(1e-3)
    state = T.init_train_state(variables, tx)
    step = T.make_unet_train_step(model, tx)
    x = rng.rand(2, 32, 32, 1).astype(np.float32)
    y = (x > 0.5).astype(np.float32)

    state, _ = step(state, x, y, None)
    path = tmp_path / "resume.msgpack"
    T.save_train_state(path, state)

    template = T.init_train_state(variables, tx)
    restored = T.load_train_state(path, template)
    assert restored.step == state.step

    import jax

    cont_orig, _ = step(state, x, y, None)
    cont_rest, _ = step(restored, x, y, None)
    for a, b in zip(jax.tree.leaves(cont_orig.params), jax.tree.leaves(cont_rest.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
