"""PV-tuning CLI — the TPU-native `finetune.py`.

Teacher-student KL distillation with straight-through code updates. Flag
names follow the reference (/root/reference/finetune.py:52-467). Instead of
torchrun+FSDP, parallelism is a ("data", "model") mesh over all visible
devices (jax.distributed handles multi-host), and the large-model memory
design is host-offload based (see pv/straight_through.py docstring):

- --microbatch_size < --batch_size accumulates gradients over microbatches
  (reference: no_sync + accumulation, finetune.py:1136);
- --loss_tokens_per_chunk chunks the lm_head+KL (memory_efficient_loss.py);
- --st_window N keeps only N layers' straight-through buffers on device per
  step, rotating round-robin with host-RAM Adam (HostSTManager) — the
  single-chip analogue of the reference's owner-computes sharding;
- --offload_teacher keeps teacher weights in host RAM and streams the
  forward layer-by-layer (HostTeacher), so the teacher never occupies HBM.

    python -m aqlm_tpu.cli.finetune --base_model DENSE --quantized_model QDIR \
        --dataset random --total_steps 100 ...
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from aqlm_tpu.cli.common import dtype_from_str, load_calibration_data, resolve_model
from aqlm_tpu.data import evaluate_perplexity
from aqlm_tpu.io import save_quantized_model
from aqlm_tpu.pv import PVConfig, init_pv_state, make_pv_step, merge_trainable
from aqlm_tpu.utils.monitoring import MetricLogger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base_model", required=True, help="dense teacher checkpoint")
    p.add_argument("--quantized_model", required=True, help="quantized student (canonical or HF AQLM)")
    p.add_argument("--dataset", default="random")
    p.add_argument("--nsamples", type=int, default=256)
    p.add_argument("--val_size", type=int, default=0,
                   help="held-out sequences for eval (split off the dataset)")
    p.add_argument("--model_seqlen", type=int, default=4096)
    p.add_argument("--batch_size", type=int, default=4, help="global batch per step")
    p.add_argument("--microbatch_size", type=int, default=None,
                   help="per-forward batch; < batch_size accumulates gradients")
    p.add_argument("--total_steps", type=int, default=1000)
    p.add_argument("--code_update_every", type=int, default=1, help="V steps per P step")
    # optimizer flags (finetune.py:190-467)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--code_lr", type=float, default=1e-3)
    p.add_argument("--beam_size", type=int, default=1)
    p.add_argument("--delta_decay", type=float, default=0.0)
    p.add_argument("--max_code_change_per_step", type=float, default=1e-2)
    p.add_argument("--code_trust_ratio", type=float, default=None)
    p.add_argument("--code_selection_temperature", type=float, default=0.0)
    p.add_argument("--force_code_update", action="store_true")
    p.add_argument("--stochastic_rounding_tau", type=float, default=0.0)
    # memory design
    p.add_argument("--loss_tokens_per_chunk", type=int, default=256,
                   help="chunked lm_head+KL (0 = full logits)")
    p.add_argument("--st_window", type=int, default=0,
                   help=">0: only N layers' ST buffers on device per step "
                        "(host-RAM Adam + round-robin rotation)")
    p.add_argument("--scan_blocks", action="store_true",
                   help="student forward as one lax.scan over stacked blocks: "
                        "bounds backward transients to one block and compiles "
                        "once for every --st_window rotation (required at 7B "
                        "scale; llama-family fully-quantized students only)")
    p.add_argument("--offload_teacher", action="store_true",
                   help="teacher weights in host RAM, layer-streamed forward")
    p.add_argument("--teacher_stream_group", type=int, default=4,
                   help="with --offload_teacher: batches sharing one "
                        "weight-streaming pass, prefetched in a background "
                        "thread (the stream is transfer-bound; N batches "
                        "per pass cut its per-batch cost by ~N)")
    # optimizer variants (configurable_adam.py parity)
    p.add_argument("--lamb", action="store_true")
    p.add_argument("--amsgrad", action="store_true")
    p.add_argument("--debias", action="store_true", default=None)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--exp_avg_dtype", choices=["float32", "bfloat16"], default=None,
                   help="reduced-precision first moments")
    p.add_argument("--exp_avg_sq_dtype", choices=["float32", "bfloat16"], default=None)
    # eval / save / resume
    p.add_argument("--eval_every_steps", type=int, default=0)
    p.add_argument("--eval_datasets", nargs="*", default=[])
    p.add_argument("--save", type=str, default=None)
    p.add_argument("--save_state_every", type=int, default=0,
                   help="checkpoint the full training state every N steps")
    p.add_argument("--resume", action="store_true",
                   help="resume from <save>/train_state.npz if present")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh_data", type=int, default=1,
                   help="data-parallel axis size (multi-chip PV)")
    p.add_argument("--mesh_model", type=int, default=1,
                   help="model-axis size: megatron-sharded student/teacher params")
    p.add_argument("--dtype", choices=["auto", "float32", "bfloat16"], default="auto")
    p.add_argument("--wandb", action="store_true")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    dtype = dtype_from_str(args.dtype)
    logger = MetricLogger(use_wandb=args.wandb, config=vars(args))
    micro = args.microbatch_size or args.batch_size
    assert args.batch_size % micro == 0, "batch_size must divide by microbatch_size"
    n_micro = args.batch_size // micro

    teacher, teacher_cfg, kind = resolve_model(args.base_model, dtype=dtype)
    assert kind == "dense", "teacher must be a dense model"
    student, student_cfg, kind = resolve_model(args.quantized_model, dtype=dtype, mode="reference")
    assert kind == "quantized", "student must be a quantized model"

    mesh = None
    if args.mesh_data > 1 or args.mesh_model > 1:
        # multi-chip PV: params/moments shard across chips — the mesh IS the
        # memory headroom, so the single-chip host-offload flags don't apply
        assert not args.st_window and not args.offload_teacher, (
            "--st_window/--offload_teacher are the single-chip memory design; "
            "with a mesh the shardings provide the headroom"
        )
        from aqlm_tpu.parallel import make_mesh, model_param_specs, shard_params

        mesh = make_mesh(data=args.mesh_data, model=args.mesh_model)
        student = shard_params(student, model_param_specs(student), mesh)
        teacher = shard_params(teacher, model_param_specs(teacher), mesh)

    from aqlm_tpu.models.family import family_name, forward_fn as family_forward

    fam = family_name(student_cfg)
    if fam != "llama":
        assert not args.scan_blocks, "scan_blocks supports llama-family students only"
        assert not args.offload_teacher, "host-streamed teacher supports llama-family only"

    data = load_calibration_data(
        args.dataset, args.nsamples + args.val_size, args.model_seqlen,
        args.base_model, teacher_cfg, seed=args.seed,
    )
    # held-out val split (the reference evaluates real datasets via
    # perplexity_eval; without hub access the val split is the honest signal)
    val_data = data[: args.val_size] if args.val_size else None
    data = data[args.val_size :]

    pv = PVConfig(
        lr=args.lr, code_lr=args.code_lr, beam_size=args.beam_size,
        delta_decay=args.delta_decay,
        max_code_change_per_step=args.max_code_change_per_step,
        code_trust_ratio=args.code_trust_ratio,
        code_selection_temperature=args.code_selection_temperature,
        force_code_update=args.force_code_update,
        stochastic_rounding_tau=args.stochastic_rounding_tau,
        chunk_tokens=args.loss_tokens_per_chunk,
        scan_blocks=args.scan_blocks,
    )
    from aqlm_tpu.pv import configurable_adamw

    moment_dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, None: None}
    cont_opt = configurable_adamw(
        pv.lr, b1=0.9, b2=0.95, weight_decay=args.weight_decay,
        lamb=args.lamb, amsgrad=args.amsgrad, debias=args.debias,
        exp_avg_dtype=moment_dtype[args.exp_avg_dtype],
        exp_avg_sq_dtype=moment_dtype[args.exp_avg_sq_dtype],
    )
    st_opt = configurable_adamw(pv.code_lr, b1=0.9, b2=0.95)

    host_teacher = None
    teacher_kind = "params"
    if args.offload_teacher:
        from aqlm_tpu.pv.teacher import HostTeacher

        host_teacher = HostTeacher(teacher, teacher_cfg)
        teacher = None  # free the device copy reference
        teacher_kind = "hidden"

    st_mgr = None
    active = None
    if args.st_window:
        import optax

        from aqlm_tpu.pv.host import HostSTManager

        # buffer Adam runs on host (HostSTManager); the device-side st
        # transform must be structure-independent (the active window's pytree
        # changes on rotation) and a no-op (grads for it are zeroed below)
        st_opt = optax.identity()

        np_moment = {None: np.float32, jnp.float32: np.float32,
                     jnp.bfloat16: np.float16}[moment_dtype[args.exp_avg_dtype]]
        st_mgr = HostSTManager(
            student, window=args.st_window, lr=pv.code_lr, moment_dtype=np_moment
        )
        active = st_mgr.active_window(0)

    fns = make_pv_step(
        student_cfg, teacher_cfg, pv, cont_opt=cont_opt, st_opt=st_opt,
        teacher_kind=teacher_kind, forward_fn=family_forward(student_cfg),
    )
    grad_fn = jax.jit(fns.grad_fn)
    apply_fn = jax.jit(fns.apply_fn)
    state = init_pv_state(student, cont_opt, st_opt, active_layers=active)

    start_step = 0
    state_path = os.path.join(args.save, "train_state.npz") if args.save else None
    if args.resume and state_path and os.path.exists(state_path):
        from aqlm_tpu.io import load_pytree

        state, meta = load_pytree(state_path, state)
        start_step = int(meta.get("step", 0))
        print(f"resumed training state at step {start_step}")

    import dataclasses as _dc

    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    n = data.shape[0]
    for _ in range(start_step * n_micro):  # replay the batch stream to the resume point
        rng.randint(0, n, size=micro)
    teacher_iter = None
    if host_teacher is not None:
        from aqlm_tpu.pv.teacher import TeacherPrefetcher

        def _batch_stream():
            # same rng stream as the inline draw below; only the prefetch
            # worker advances rng once this iterator owns it
            while True:
                yield data[rng.randint(0, n, size=micro)]

        teacher_iter = TeacherPrefetcher(
            host_teacher, _batch_stream(),
            group_size=args.teacher_stream_group,
        )
    losses = []
    windowed = st_mgr is not None and args.scan_blocks  # single-compile rotation

    def _zeros_window(active):
        # the grad step's ST correction (st - stop_grad(st)) is identically
        # zero and dL/d(st) = gw regardless of st's VALUE, so the grad pass
        # gets a zeros window — skipping the ~0.8 GB/step host->device
        # buffer upload (the dev tunnel moves ~25-30 MB/s; NOTES.md r5)
        return {
            name: jnp.zeros((len(active),) + buf.shape, jnp.float32)
            for name, buf in st_mgr.buffers[active[0]].items()
        }

    for step in range(start_step, args.total_steps):
        win_start = None
        if st_mgr is not None:
            active = st_mgr.active_window(step)
            if windowed:
                win_start = jnp.int32(active[0])
                st_dev = _zeros_window(active)
            else:
                st_dev = [
                    {k: jnp.asarray(v) for k, v in e.items()} for e in st_mgr.fetch(active)
                ]
            state = _dc.replace(state, st_buffers=st_dev)
        # gradient accumulation over microbatches
        acc, loss_sum = None, 0.0
        for _ in range(n_micro):
            if teacher_iter is not None:
                batch, t_in = next(teacher_iter)
            else:
                idx = rng.randint(0, n, size=micro)
                batch = data[idx]
                t_in = teacher
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                batch = jax.device_put(
                    jnp.asarray(batch), NamedSharding(mesh, PartitionSpec("data", None))
                )
            loss, grads = grad_fn(state, t_in, batch, None, win_start)
            loss_sum += float(loss)
            acc = grads if acc is None else jax.tree.map(jnp.add, acc, grads)
        if st_mgr is not None:
            # buffers update on host; zero their device-side grads so
            # apply_fn's st_opt is a no-op for them
            g_tr, g_st = acc
            if windowed:
                # download grads in bf16 (halves the device->host transfer;
                # host Adam re-accumulates in f32)
                g16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), g_st)
                g_list = st_mgr.window_to_list(active, {
                    k: np.asarray(v).astype(np.float32) for k, v in g16.items()
                })
            else:
                g_list = [{k: np.asarray(v) for k, v in e.items()} for e in g_st]
            st_mgr.adam_update(active, [
                {k: v / n_micro for k, v in e.items()} for e in g_list
            ])
            if windowed:
                # the updated buffers only feed the V-step beam-search
                # target; upload bf16 unless delta-decay mixing must write
                # f32 precision back (store below)
                up_dtype = np.float32 if pv.delta_decay != 0 else jnp.bfloat16
                st_dev = {
                    k: jnp.asarray(v.astype(up_dtype))
                    for k, v in st_mgr.fetch_window(active).items()
                }
            else:
                st_dev = [
                    {k: jnp.asarray(v) for k, v in e.items()} for e in st_mgr.fetch(active)
                ]
            state = _dc.replace(state, st_buffers=st_dev)
            acc = (g_tr, jax.tree.map(jnp.zeros_like, g_st))
        state = apply_fn(state, acc, 1.0 / n_micro)
        losses.append(loss_sum / n_micro)
        if args.code_update_every and (step + 1) % args.code_update_every == 0:
            key, sub = jax.random.split(key)
            state = fns.code_step(state, sub, active=active if st_mgr is not None else None)
            # persist delta-decay-mixed buffers; with delta_decay=0 the V
            # step leaves them unchanged and (windowed) storing would round
            # host-Adam f32 state through the bf16 upload
            if st_mgr is not None and (pv.delta_decay != 0 or not windowed):
                st_list = (
                    st_mgr.window_to_list(active, state.st_buffers) if windowed
                    else [{k: np.asarray(v) for k, v in e.items()} for e in state.st_buffers]
                )
                st_mgr.store(active, st_list)
        if args.save_state_every and state_path and (step + 1) % args.save_state_every == 0:
            from aqlm_tpu.io import save_pytree

            save_pytree(state_path, state, metadata={"step": step + 1})
        if step % 10 == 0:
            logger.log({"kl_loss": losses[-1]}, step=step)
            print(f"step {step}: kl={losses[-1]:.5f}")
        if args.eval_every_steps and (step + 1) % args.eval_every_steps == 0:
            params = merge_trainable(state.trainable, state.frozen)
            if val_data is not None:
                ppl = evaluate_perplexity(
                    params, student_cfg, val_data, forward_fn=family_forward(student_cfg)
                )
                logger.log({"ppl_val": ppl}, step=step)
                print(f"step {step}: val ppl={ppl:.4f}")
            for ds in args.eval_datasets:
                ids = load_calibration_data(
                    ds, 8, args.model_seqlen, args.base_model, teacher_cfg, eval_mode=True
                )[:8]
                ppl = evaluate_perplexity(
                    params, student_cfg, ids, forward_fn=family_forward(student_cfg)
                )
                logger.log({f"ppl_{ds}": ppl}, step=step)
                print(f"step {step}: {ds} ppl={ppl:.4f}")

    params = merge_trainable(state.trainable, state.frozen)
    if args.save:
        save_quantized_model(args.save, params, student_cfg, extra_config={"cli_args": vars(args)})
        print(f"saved PV-tuned model to {args.save}")
    result = {"final_kl": losses[-1] if losses else None, "losses": losses[:: max(1, len(losses) // 20)]}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
