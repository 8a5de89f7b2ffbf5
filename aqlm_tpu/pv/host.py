"""Host-RAM straight-through buffer manager with round-robin activation.

A 7B student's dense-f32 ST buffers are ~27 GB — they cannot live in a
16 GB chip's HBM alongside the student. The reference solves the analogous
GPU problem with owner-computes sharding: each rank materializes only the
QuantizedWeights it owns and ships grads/weights around with isend/irecv
(/root/reference/src/pv_optimizer.py:309-424, pv_utils.py:139-196), plus
CPU-offloaded optimizer state (src/configurable_adam.py:164-188).

The single-chip TPU analogue: ALL buffers + Adam moments live in host RAM;
each PV step activates a WINDOW of layers (round-robin) whose buffers are
staged to the device. The jitted grad step returns straight-through grads
only for the active window; Adam for the buffers runs on host (numpy). Over
`ceil(L / window)` steps every layer's codes receive a beam-search update —
the same total code-update throughput as the reference's every-step sweep
bounded by max_code_change_per_step, scheduled by layer instead of by
fraction. Continuous params (codebooks/scales/norms) still update on-device
every step.
"""

from __future__ import annotations

import numpy as np

from aqlm_tpu.models.llama import QUANTIZABLE_PROJS
from aqlm_tpu.ops.runtime import QuantizedLinear

__all__ = ["HostSTManager"]


def _np_dequantize(lin: QuantizedLinear) -> np.ndarray:
    """Host-side dequantization of a reference-mode projection.

    Runs entirely on host: a 7B model's ST-buffer init would otherwise push
    ~27 GB of dequantized weights device->host through the dev tunnel (and
    sustained tunnel load is what kills long runs — NOTES.md). torch's
    multithreaded index_select is ~5-10x numpy fancy indexing here (the
    all-numpy build measured 14-16 min for a 7B model, NOTES.md r4); numpy
    remains the fallback."""
    codes = np.asarray(lin.codes).astype(np.int64)  # [OG, IG, K]
    cb = np.asarray(lin.codebooks, np.float32)  # [K, S, og, ig]
    scales = np.asarray(lin.scales, np.float32)
    og_n, ig_n, K = codes.shape
    _, s, og, ig = cb.shape
    try:
        import torch

        flat = None
        for k in range(K):
            idx = torch.from_numpy(np.ascontiguousarray(codes[:, :, k].reshape(-1)))
            tab = torch.from_numpy(cb[k].reshape(s, og * ig).copy())
            part = torch.index_select(tab, 0, idx)
            flat = part if flat is None else flat.add_(part)
        # scale on the flat [G, og*ig] view (a 4-D numpy broadcast multiply
        # at this size costs ~0.8 s/projection)
        sflat = (
            np.repeat(scales, ig_n) if scales.ndim == 1 else scales.reshape(-1)
        )
        flat.mul_(torch.from_numpy(sflat.astype(np.float32))[:, None])
        groups = flat.numpy().reshape(og_n, ig_n, og, ig)
    except ImportError:
        groups = np.zeros((og_n, ig_n, og, ig), np.float32)
        for k in range(K):
            groups += cb[k, codes[:, :, k]]
        if scales.ndim == 1:  # per-output-group
            groups = groups * scales[:, None, None, None]
        else:  # [OG, IG] per-group
            groups = groups * scales[:, :, None, None]
    # [OG, IG, og, ig] -> [OG*og, IG*ig]
    return np.ascontiguousarray(
        groups.transpose(0, 2, 1, 3).reshape(og_n * og, ig_n * ig)
    )


class HostSTManager:
    """Full-model ST buffers + Adam moments in host RAM.

    Usage per training step (see cli/finetune.py):
        active = mgr.active_window(step)          # layer indices
        st = mgr.fetch(active)                    # device-ready buffers list
        ... run grad_fn with state.st_buffers=st, get g_st ...
        mgr.adam_update(active, g_st)             # host Adam, stores moments
        st_new = mgr.fetch(active)                # updated buffers for V step
    """

    def __init__(
        self,
        params: dict,
        *,
        window: int = 1,
        lr: float = 1e-3,
        b1: float = 0.9,
        b2: float = 0.95,
        eps: float = 1e-8,
        moment_dtype=np.float32,
    ):
        self.window = window
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.n_layers = len(params["layers"])
        self.buffers: list[dict[str, np.ndarray]] = []
        self.m: list[dict[str, np.ndarray]] = []
        self.v: list[dict[str, np.ndarray]] = []
        self.t: list[dict[str, int]] = []
        for layer in params["layers"]:
            entry, me, ve, te = {}, {}, {}, {}
            for name in QUANTIZABLE_PROJS:
                lin = layer.get(name)
                if isinstance(lin, QuantizedLinear):
                    entry[name] = _np_dequantize(lin)  # owned, writable copy
                    me[name] = np.zeros(entry[name].shape, moment_dtype)
                    ve[name] = np.zeros(entry[name].shape, moment_dtype)
                    te[name] = 0
            self.buffers.append(entry)
            self.m.append(me)
            self.v.append(ve)
            self.t.append(te)

    def active_window(self, step: int) -> tuple[int, ...]:
        """Round-robin window of layer indices active at `step`."""
        n_windows = -(-self.n_layers // self.window)
        w = step % n_windows
        return tuple(range(w * self.window, min((w + 1) * self.window, self.n_layers)))

    def fetch(self, active: tuple[int, ...]) -> list[dict]:
        """st_buffers list for PVState: active layers' buffers, {} elsewhere."""
        return [
            {k: v.copy() for k, v in self.buffers[li].items()} if li in active else {}
            for li in range(self.n_layers)
        ]

    def fetch_window(self, active: tuple[int, ...]) -> dict[str, np.ndarray]:
        """Windowed-stack form {proj: [W, out, in]} (scan_blocks single-compile
        path; window slot w maps to layer active[w])."""
        names = list(self.buffers[active[0]].keys())
        return {
            name: np.stack([self.buffers[li][name] for li in active])
            for name in names
        }

    def window_to_list(self, active: tuple[int, ...], window: dict) -> list[dict]:
        """Expand a windowed stack (buffers or grads) to the per-layer list form."""
        return [
            {name: np.asarray(stack[active.index(li)]) for name, stack in window.items()}
            if li in active else {}
            for li in range(self.n_layers)
        ]

    def adam_update(self, active: tuple[int, ...], g_st: list[dict]) -> None:
        """Debiased Adam on the active buffers (host, numpy)."""
        for li in active:
            for name, g in g_st[li].items():
                g = np.asarray(g, np.float32)
                self.t[li][name] += 1
                t = self.t[li][name]
                m = self.m[li][name].astype(np.float32) * self.b1 + (1 - self.b1) * g
                v = self.v[li][name].astype(np.float32) * self.b2 + (1 - self.b2) * g * g
                self.m[li][name] = m.astype(self.m[li][name].dtype)
                self.v[li][name] = v.astype(self.v[li][name].dtype)
                mhat = m / (1 - self.b1 ** t)
                vhat = v / (1 - self.b2 ** t)
                self.buffers[li][name] -= self.lr * mhat / (np.sqrt(vhat) + self.eps)

    def store(self, active: tuple[int, ...], st_buffers: list[dict]) -> None:
        """Write back (e.g. after delta-decay mixing in the V step)."""
        for li in active:
            for name, buf in st_buffers[li].items():
                self.buffers[li][name] = np.array(buf, np.float32)
