"""Checkpoint/resume and profiling helper tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from banggameengine_tpu.engine import make_step_fn
from banggameengine_tpu.scene.synthetic import build_falling_boxes
from banggameengine_tpu.state import InputFrame
from banggameengine_tpu.utils import load_checkpoint, save_checkpoint
from banggameengine_tpu.utils.profiling import StepTimer


def test_checkpoint_roundtrip(tmp_path):
    state, static = build_falling_boxes(4, with_character=True)
    fn = make_step_fn(static, donate=False)
    inp = InputFrame.zero()
    for _ in range(60):
        state, _ = fn(state, inp)

    p = str(tmp_path / "ckpt")
    save_checkpoint(p, state, metadata={"tag": "test"})
    loaded, meta = load_checkpoint(p)
    assert meta == {"tag": "test"}
    for f in dataclasses.fields(state):
        np.testing.assert_array_equal(
            np.asarray(getattr(state, f.name)),
            np.asarray(getattr(loaded, f.name)),
            err_msg=f.name,
        )


def test_checkpoint_resume_continues_identically(tmp_path):
    state, static = build_falling_boxes(4)
    fn = make_step_fn(static, donate=False)
    inp = InputFrame.zero()
    for _ in range(30):
        state, _ = fn(state, inp)
    p = str(tmp_path / "mid")
    save_checkpoint(p, state)

    # continue original
    cont = state
    for _ in range(30):
        cont, _ = fn(cont, inp)

    # resume from checkpoint
    resumed, _ = load_checkpoint(p)
    for _ in range(30):
        resumed, _ = fn(resumed, inp)

    np.testing.assert_array_equal(np.asarray(cont.pos), np.asarray(resumed.pos))
    np.testing.assert_array_equal(np.asarray(cont.quat), np.asarray(resumed.quat))


def test_checkpoint_batched_worlds(tmp_path):
    state, static = build_falling_boxes(2)
    batched = jax.tree.map(lambda x: jnp.stack([x] * 3), state)
    p = str(tmp_path / "batched")
    save_checkpoint(p, batched)
    loaded, _ = load_checkpoint(p)
    assert loaded.pos.shape == batched.pos.shape


def test_checkpoint_bad_version(tmp_path):
    state, _ = build_falling_boxes(1)
    p = str(tmp_path / "v")
    save_checkpoint(p, state)
    # corrupt the header version
    import json

    import numpy as np  # noqa: F811

    with np.load(p + ".npz") as d:
        fields = {k: d[k] for k in d.files}
    hdr = json.loads(bytes(fields["__header__"]).decode())
    hdr["format_version"] = 999
    fields["__header__"] = np.frombuffer(json.dumps(hdr).encode(), np.uint8)
    np.savez(p + ".npz", **fields)
    with pytest.raises(ValueError):
        load_checkpoint(p)


def test_step_timer():
    t = StepTimer("phys")
    with t.measure():
        pass
    with t.measure():
        pass
    assert t.count == 2
    assert t.mean >= 0.0
    assert "phys" in t.report()
