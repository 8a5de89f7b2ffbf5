"""Straight-through PV optimizer tests on a tiny quantized model."""

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.config import SCHEME_2X8
from aqlm_tpu.models import llama
from aqlm_tpu.models.quantize import random_quantized_params
from aqlm_tpu.pv.straight_through import (
    PVConfig,
    init_pv_state,
    make_pv_step,
    materialize_st_params,
)
from aqlm_tpu.pv.trainer import merge_trainable
import optax


def _setup(key, n_layers=1, active_layers=None, teacher_kind="params", **pv_kwargs):
    cfg = llama.ModelConfig.tiny(num_layers=n_layers)
    student = random_quantized_params(key, cfg, SCHEME_2X8, mode="reference")
    teacher = llama.init_random_params(jax.random.PRNGKey(42), cfg)
    pv = PVConfig(lr=1e-3, code_lr=3e-3, **pv_kwargs)
    fns = make_pv_step(cfg, cfg, pv, teacher_kind=teacher_kind)
    cont_opt = optax.adamw(pv.lr, b1=0.9, b2=0.95)
    st_opt = optax.adam(pv.code_lr, b1=0.9, b2=0.95)
    state = init_pv_state(student, cont_opt, st_opt, active_layers=active_layers)
    return cfg, student, teacher, state, jax.jit(fns.grad_step), fns.code_step


def test_st_materialization_value_equals_dequant(key):
    cfg = llama.ModelConfig.tiny(num_layers=1)
    params = random_quantized_params(key, cfg, SCHEME_2X8, mode="reference")
    import optax as _o

    state = init_pv_state(params, _o.adam(1e-3), _o.adam(1e-3))
    eff = materialize_st_params(params, state.st_buffers)
    ids = jnp.ones((1, 8), jnp.int32)
    ref_logits, _ = llama.forward(params, cfg, ids)
    eff_logits, _ = llama.forward(eff, cfg, ids)
    np.testing.assert_allclose(
        np.asarray(eff_logits, np.float32), np.asarray(ref_logits, np.float32), atol=1e-2
    )


def test_pv_grad_step_moves_st_buffers(key):
    cfg, student, teacher, state, grad_step, _ = _setup(key)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    before = np.asarray(state.st_buffers[0]["q_proj"])
    state, loss = grad_step(state, teacher, ids)
    after = np.asarray(state.st_buffers[0]["q_proj"])
    assert np.isfinite(float(loss))
    assert not np.allclose(before, after)  # straight-through grads reached the buffer


def test_pv_full_alternation_reduces_loss(key):
    cfg, student, teacher, state, grad_step, code_step = _setup(
        key, max_code_change_per_step=0.25, delta_decay=0.3
    )
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    losses = []
    rng = jax.random.PRNGKey(7)
    for i in range(6):
        for _ in range(3):
            state, loss = grad_step(state, teacher, ids)
            losses.append(float(loss))
        rng, sub = jax.random.split(rng)
        state = code_step(state, sub)
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    # code dtype preserved through the V steps
    assert np.asarray(state.frozen["layers"][0]["q_proj"].codes).dtype == np.uint8


def test_v_step_tracks_buffer(key):
    """When the ST buffer moves far from dequant(codes), the V step must
    re-assign codes (up to max_code_change_per_step) toward the buffer."""
    import dataclasses

    cfg, student, teacher, state, grad_step, code_step = _setup(
        key, max_code_change_per_step=0.25
    )
    st = state.st_buffers
    st[0]["q_proj"] = st[0]["q_proj"] + 5.0 * jax.random.normal(
        jax.random.PRNGKey(1), st[0]["q_proj"].shape
    )
    state = dataclasses.replace(state, st_buffers=st)
    before = np.asarray(state.frozen["layers"][0]["q_proj"].codes)
    state = code_step(state, jax.random.PRNGKey(2))
    after = np.asarray(state.frozen["layers"][0]["q_proj"].codes)
    frac = np.any(before != after, axis=-1).mean()
    assert 0.2 <= frac <= 0.25 + 1e-6, frac  # capped by max_code_change


def test_max_code_change_respected_in_v_step(key):
    cfg, student, teacher, state, grad_step, code_step = _setup(
        key, max_code_change_per_step=0.1
    )
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    state, _ = grad_step(state, teacher, ids)
    before = {
        name: np.asarray(q.codes)
        for name, q in state.frozen["layers"][0].items()
        if hasattr(q, "codes") and q.codes is not None
    }
    state = code_step(state, jax.random.PRNGKey(0))
    for name, prev in before.items():
        new = np.asarray(state.frozen["layers"][0][name].codes)
        frac = np.any(prev != new, axis=-1).mean()
        assert frac <= 0.1 + 1e-6, (name, frac)


def test_chunked_kl_matches_full_logit_loss(key):
    """chunk_tokens>0 (the real path) must equal the full-logit KL."""
    cfg = llama.ModelConfig.tiny(num_layers=1)
    student = random_quantized_params(key, cfg, SCHEME_2X8, mode="reference")
    teacher = llama.init_random_params(jax.random.PRNGKey(42), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    losses = {}
    for chunk in (0, 8):
        pv = PVConfig(chunk_tokens=chunk)
        fns = make_pv_step(cfg, cfg, pv)
        cont_opt = optax.adamw(pv.lr)
        st_opt = optax.adam(pv.code_lr)
        state = init_pv_state(student, cont_opt, st_opt)
        losses[chunk], _ = jax.jit(fns.grad_fn)(state, teacher, ids)
    np.testing.assert_allclose(float(losses[0]), float(losses[8]), rtol=1e-3)


def test_active_layer_subset(key):
    """Only active layers carry ST buffers; inactive codebooks still train."""
    cfg, student, teacher, state, grad_step, code_step = _setup(
        key, n_layers=2, active_layers=(1,)
    )
    assert state.st_buffers[0] == {} and "q_proj" in state.st_buffers[1]
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    cb_before = np.asarray(state.trainable["layers"][0]["q_proj"].codebooks)
    state, loss = grad_step(state, teacher, ids)
    assert np.isfinite(float(loss))
    # inactive layer 0's codebooks still received gradients (P phase)
    cb_after = np.asarray(state.trainable["layers"][0]["q_proj"].codebooks)
    assert not np.allclose(cb_before, cb_after)
    # V step touches only the active layer's codes
    codes0 = np.asarray(state.frozen["layers"][0]["q_proj"].codes)
    state = code_step(state, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        codes0, np.asarray(state.frozen["layers"][0]["q_proj"].codes)
    )


def test_teacher_hidden_matches_params_path(key):
    """Precomputed teacher hidden (host-teacher contract) == in-step teacher."""
    from aqlm_tpu.pv.teacher import HostTeacher

    cfg = llama.ModelConfig.tiny(num_layers=1)
    student = random_quantized_params(key, cfg, SCHEME_2X8, mode="reference")
    teacher = llama.init_random_params(jax.random.PRNGKey(42), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    pv = PVConfig()
    cont_opt, st_opt = optax.adamw(pv.lr), optax.adam(pv.code_lr)

    fns_p = make_pv_step(cfg, cfg, pv, teacher_kind="params")
    state = init_pv_state(student, cont_opt, st_opt)
    loss_p, _ = jax.jit(fns_p.grad_fn)(state, teacher, ids)

    fns_h = make_pv_step(cfg, cfg, pv, teacher_kind="hidden")
    tbatch = HostTeacher(teacher, cfg).batch(ids)
    loss_h, _ = jax.jit(fns_h.grad_fn)(state, tbatch, ids)
    np.testing.assert_allclose(float(loss_p), float(loss_h), rtol=2e-4)


def test_grad_accumulation_equals_big_batch(key):
    """Two microbatches with scale 1/2 == one combined batch (KL is a mean)."""
    cfg, student, teacher, state, _, _ = _setup(key)
    pv = PVConfig(lr=1e-3, code_lr=3e-3)
    fns = make_pv_step(cfg, cfg, pv)
    grad_fn = jax.jit(fns.grad_fn)
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, cfg.vocab_size)

    _, g_full = grad_fn(state, teacher, ids)
    _, g_a = grad_fn(state, teacher, ids[:2])
    _, g_b = grad_fn(state, teacher, ids[2:])
    g_acc = jax.tree.map(lambda a, b: (a + b) * 0.5, g_a, g_b)
    flat_full = jax.tree.leaves(g_full)
    flat_acc = jax.tree.leaves(g_acc)
    for a, b in zip(flat_full, flat_acc):
        # bf16 forward: per-microbatch rounding differs from the fused batch
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=2e-2, atol=1e-4
        )


def test_host_st_manager_round_robin(key):
    from aqlm_tpu.pv.host import HostSTManager

    cfg = llama.ModelConfig.tiny(num_layers=3)
    student = random_quantized_params(key, cfg, SCHEME_2X8, mode="reference")
    mgr = HostSTManager(student, window=2, lr=0.1)
    assert mgr.active_window(0) == (0, 1)
    assert mgr.active_window(1) == (2,)
    assert mgr.active_window(2) == (0, 1)
    st = mgr.fetch((0, 1))
    assert "q_proj" in st[0] and st[2] == {}
    # adam moves only active buffers
    g = [{k: np.ones_like(v) for k, v in e.items()} if i < 2 else {}
         for i, e in enumerate(st)]
    before2 = {k: v.copy() for k, v in mgr.buffers[2].items()}
    mgr.adam_update((0, 1), g)
    assert not np.allclose(mgr.buffers[0]["q_proj"], st[0]["q_proj"])
    for k, v in before2.items():
        np.testing.assert_array_equal(v, mgr.buffers[2][k])


def test_scan_blocks_matches_unrolled(key):
    """scan_blocks student forward == the unrolled path: loss AND grads.

    f32 params so the two schedules are bit-comparable; 3 layers with a
    contiguous active window in the middle exercises the masked
    dynamic-slice ST correction on both sides of the window."""
    cfg = llama.ModelConfig.tiny(num_layers=3)
    student = random_quantized_params(
        key, cfg, SCHEME_2X8, mode="reference", dtype=jnp.float32
    )
    teacher = llama.init_random_params(jax.random.PRNGKey(42), cfg, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)

    cont_opt = optax.adamw(1e-3)
    st_opt = optax.adam(3e-3)
    grads = {}
    losses = {}
    # manual-seg2: 3 layers over 2-layer segments (2+1 — uneven split)
    variants = [("unrolled", None), ("dequant", "dequant"), ("manual", "manual"),
                ("manual-seg2", "manual")]
    for label, remat in variants:
        if remat is None:
            pv = PVConfig(chunk_tokens=8, scan_blocks=False)
        else:
            pv = PVConfig(chunk_tokens=8, scan_blocks=True, scan_remat=remat,
                          scan_segment_layers=2 if label.endswith("seg2") else 8)
        fns = make_pv_step(cfg, cfg, pv)
        state = init_pv_state(student, cont_opt, st_opt, active_layers=(1,))
        loss, g = jax.jit(fns.grad_fn)(state, teacher, ids)
        losses[label] = float(loss)
        grads[label] = g
    flat_u, tree_u = jax.tree.flatten(grads["unrolled"])
    for label in ("dequant", "manual", "manual-seg2"):
        np.testing.assert_allclose(losses[label], losses["unrolled"], rtol=1e-5)
        flat_s, tree_s = jax.tree.flatten(grads[label])
        assert tree_u == tree_s
        for a, b in zip(flat_u, flat_s):
            np.testing.assert_allclose(
                np.asarray(b, np.float32), np.asarray(a, np.float32),
                rtol=1e-4, atol=1e-5,
            )


def test_windowed_st_matches_list_form(key):
    """Windowed {proj: [W,...]} + traced window_start == per-layer list form
    for loss, trainable grads, and the ST grads (slot <-> layer mapping);
    the V step round-trips the windowed structure."""
    import dataclasses as _dc

    cfg = llama.ModelConfig.tiny(num_layers=3)
    student = random_quantized_params(
        key, cfg, SCHEME_2X8, mode="reference", dtype=jnp.float32
    )
    teacher = llama.init_random_params(jax.random.PRNGKey(42), cfg, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)

    pv = PVConfig(chunk_tokens=8, scan_blocks=True)
    fns = make_pv_step(cfg, cfg, pv)
    grad_fn = jax.jit(fns.grad_fn)
    cont_opt = optax.adamw(1e-3)
    st_opt = optax.identity()

    for active in ((0,), (1,), (2,)):
        state_l = init_pv_state(student, cont_opt, st_opt, active_layers=active)
        loss_l, (gtr_l, gst_l) = grad_fn(state_l, teacher, ids)

        window = {
            name: jnp.stack([state_l.st_buffers[li][name] for li in active])
            for name in state_l.st_buffers[active[0]]
        }
        state_w = _dc.replace(state_l, st_buffers=window)
        loss_w, (gtr_w, gst_w) = grad_fn(
            state_w, teacher, ids, None, jnp.int32(active[0])
        )
        np.testing.assert_allclose(float(loss_w), float(loss_l), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(gtr_l), jax.tree.leaves(gtr_w)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6)
        for name, stack in gst_w.items():
            np.testing.assert_allclose(
                np.asarray(stack[0]), np.asarray(gst_l[active[0]][name]),
                rtol=1e-4, atol=1e-6,
            )

        state_w2 = fns.code_step(state_w, jax.random.PRNGKey(7), active=active)
        assert isinstance(state_w2.st_buffers, dict)
        assert set(state_w2.st_buffers) == set(window)


def test_scan_kernel_dequant_matches_xla(key):
    """scan_remat="manual" with the Pallas one-hot dequant == the XLA-dequant
    path, at the kernel's bf16-codebook tolerance (the kernel impl exists
    because XLA's dequant gather crashes the v5e worker after ~64 calls —
    experiments/dequant_crash_probe)."""
    cfg = llama.ModelConfig.tiny(num_layers=3)
    student = random_quantized_params(
        key, cfg, SCHEME_2X8, mode="reference", dtype=jnp.float32
    )
    teacher = llama.init_random_params(jax.random.PRNGKey(42), cfg, dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)
    cont_opt = optax.adamw(1e-3)
    st_opt = optax.adam(3e-3)

    out = {}
    for impl in ("xla", "kernel"):
        pv = PVConfig(chunk_tokens=8, scan_blocks=True, scan_remat="manual",
                      scan_dequant=impl)
        fns = make_pv_step(cfg, cfg, pv)
        state = init_pv_state(student, cont_opt, st_opt, active_layers=(1,))
        loss, g = jax.jit(fns.grad_fn)(state, teacher, ids)
        out[impl] = (float(loss), g)
    np.testing.assert_allclose(out["kernel"][0], out["xla"][0], rtol=2e-2)
    flat_x, tree_x = jax.tree.flatten(out["xla"][1])
    flat_k, tree_k = jax.tree.flatten(out["kernel"][1])
    assert tree_x == tree_k
    for a, b in zip(flat_x, flat_k):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        # the kernel path rounds codebook entries to bf16, which perturbs the
        # near-zero KL grads relatively; gate on relative Frobenius error —
        # a layout/mask/sign bug in the manual VJP lands at O(1), bf16 noise
        # at a few percent
        na = np.linalg.norm(a)
        rel = np.linalg.norm(a - b) / max(na, 1e-6)
        assert rel < 0.15, (a.shape, rel)


def test_teacher_hidden_many_and_prefetcher(key):
    """Multi-batch weight-streaming pass == per-batch hidden; the background
    prefetcher yields the same (batch, teacher) pairs in order."""
    from aqlm_tpu.pv.teacher import HostTeacher, TeacherPrefetcher

    cfg = llama.ModelConfig.tiny(num_layers=2)
    teacher = llama.init_random_params(jax.random.PRNGKey(42), cfg)
    ht = HostTeacher(teacher, cfg)
    batches = [
        jax.random.randint(jax.random.PRNGKey(i), (2, 16), 0, cfg.vocab_size)
        for i in range(5)
    ]
    many = ht.hidden_many(batches)
    for ids, h in zip(batches, many):
        np.testing.assert_allclose(
            np.asarray(h, np.float32), np.asarray(ht.hidden(ids), np.float32),
            rtol=1e-5, atol=1e-5,
        )

    pf = TeacherPrefetcher(ht, iter(batches), group_size=2, depth=1)
    got = list(pf)
    assert len(got) == 5
    for (ids_in, t_in), ids_ref, h_ref in zip(got, batches, many):
        np.testing.assert_array_equal(np.asarray(ids_in), np.asarray(ids_ref))
        np.testing.assert_allclose(
            np.asarray(t_in["hidden"], np.float32), np.asarray(h_ref, np.float32),
            rtol=1e-5, atol=1e-5,
        )
        assert "head" in t_in and "embed" in t_in
