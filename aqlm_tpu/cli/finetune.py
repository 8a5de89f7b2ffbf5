"""PV-tuning CLI — the TPU-native `finetune.py`.

Teacher-student KL distillation with straight-through code updates. Flag
names follow the reference (/root/reference/finetune.py:52-467). Instead of
torchrun+FSDP, parallelism is a ("data", "model") mesh over all visible
devices (jax.distributed handles multi-host).

    python -m aqlm_tpu.cli.finetune --base_model DENSE --quantized_model QDIR \
        --dataset random --total_steps 100 --update_codes ...
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
    p.add_argument("--model_seqlen", type=int, default=4096)
    p.add_argument("--batch_size", type=int, default=4)
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
    p.add_argument("--dtype", choices=["auto", "float32", "bfloat16"], default="auto")
    p.add_argument("--wandb", action="store_true")
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    dtype = dtype_from_str(args.dtype)
    logger = MetricLogger(use_wandb=args.wandb, config=vars(args))

    teacher, teacher_cfg, kind = resolve_model(args.base_model, dtype=dtype)
    assert kind == "dense", "teacher must be a dense model"
    student, student_cfg, kind = resolve_model(args.quantized_model, dtype=dtype, mode="reference")
    assert kind == "quantized", "student must be a quantized model"

    data = load_calibration_data(
        args.dataset, args.nsamples, args.model_seqlen, args.base_model, teacher_cfg, seed=args.seed
    )

    pv = PVConfig(
        lr=args.lr, code_lr=args.code_lr, beam_size=args.beam_size,
        delta_decay=args.delta_decay,
        max_code_change_per_step=args.max_code_change_per_step,
        code_trust_ratio=args.code_trust_ratio,
        code_selection_temperature=args.code_selection_temperature,
        force_code_update=args.force_code_update,
        stochastic_rounding_tau=args.stochastic_rounding_tau,
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
    grad_step, code_step = make_pv_step(
        student_cfg, teacher_cfg, pv, cont_opt=cont_opt, st_opt=st_opt
    )
    grad_step = jax.jit(grad_step)
    state = init_pv_state(student, cont_opt, st_opt)

    start_step = 0
    state_path = os.path.join(args.save, "train_state.npz") if args.save else None
    if args.resume and state_path and os.path.exists(state_path):
        from aqlm_tpu.io import load_pytree

        state, meta = load_pytree(state_path, state)
        start_step = int(meta.get("step", 0))
        print(f"resumed training state at step {start_step}")

    rng = np.random.RandomState(args.seed)
    key = jax.random.PRNGKey(args.seed)
    n = data.shape[0]
    for _ in range(start_step):  # replay the batch stream up to the resume point
        rng.randint(0, n, size=args.batch_size)
    losses = []
    for step in range(start_step, args.total_steps):
        idx = rng.randint(0, n, size=args.batch_size)
        state, loss = grad_step(state, teacher, data[idx])
        losses.append(float(loss))
        if args.code_update_every and (step + 1) % args.code_update_every == 0:
            key, sub = jax.random.split(key)
            state = code_step(state, sub)
        if args.save_state_every and state_path and (step + 1) % args.save_state_every == 0:
            from aqlm_tpu.io import save_pytree

            save_pytree(state_path, state, metadata={"step": step + 1})
        if step % 10 == 0:
            logger.log({"kl_loss": losses[-1]}, step=step)
            print(f"step {step}: kl={losses[-1]:.5f}")
        if args.eval_every_steps and (step + 1) % args.eval_every_steps == 0:
            params = merge_trainable(state.trainable, state.frozen)
            for ds in args.eval_datasets:
                ids = load_calibration_data(ds, 8, args.model_seqlen, args.base_model, teacher_cfg, eval_mode=True)[:8]
                ppl = evaluate_perplexity(params, student_cfg, ids)
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
