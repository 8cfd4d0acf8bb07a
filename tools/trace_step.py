"""Capture an xplane trace of one flagship model's compiled train step.

    python -m tools.trace_step --model spexplus --out /tmp/trace_spex
    python -m tools.trace_step --model spexplus --steps 4 | tail

Reuses the reference envelopes from tools/bench_models; feed the output
dir to wesep_tpu.tools.op_profile for the BASELINE.md attribution tables.
"""

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="spexplus")
    parser.add_argument("--out", default="/tmp/wesep_trace")
    parser.add_argument("--steps", type=int, default=3)
    args = parser.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    from tools.bench_models import CHUNK_SEC, ENVELOPES, SR
    from wesep_tpu.models import get_model
    from wesep_tpu.train.losses import si_sdr_loss
    from wesep_tpu.train.schedulers import exponential_decrease
    from wesep_tpu.train.trainer import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from wesep_tpu.utils import setup_compilation_cache
    from wesep_tpu.utils.profiling import trace

    setup_compilation_cache()
    env = ENVELOPES[args.model]
    batch_n = env["batch"]
    model = get_model(env["model"])(**env["args"])
    t = int(CHUNK_SEC * SR)
    rng = np.random.default_rng(0)
    batch = {
        "wav_mix": jnp.asarray(
            rng.standard_normal((batch_n, t)).astype(np.float32) * 0.1),
        "wav_targets": jnp.asarray(
            rng.standard_normal((batch_n, t)).astype(np.float32) * 0.1),
        "spk_embeds": jnp.asarray(
            rng.standard_normal((batch_n, 256)).astype(np.float32)),
        "spk_label": jnp.zeros((batch_n,), jnp.int32),
    }
    sched = exponential_decrease(
        num_epochs=150, epoch_iter=1000, initial_lr=1e-3,
        final_lr=2.5e-5, warm_up_epoch=0)
    optimizer = make_optimizer(sched, weight_decay=1e-4, clip_grad=5.0)
    step = jax.jit(
        make_train_step(model, optimizer, [si_sdr_loss],
                        loss_posi=env.get("loss_posi", ((0,),)),
                        loss_weight=env.get("loss_weight", ((1.0,),)),
                        compute_dtype=jnp.bfloat16),
        donate_argnums=(0,),
    )
    state = init_train_state(model, jax.random.PRNGKey(0), batch, optimizer)
    for _ in range(3):
        state, metrics = step(state, batch)
        float(metrics["loss"])
    with trace(args.out):
        for _ in range(args.steps):
            state, metrics = step(state, batch)
        float(metrics["loss"])
    print(f"trace written to {args.out}; summarize with:")
    print(f"  python -m wesep_tpu.tools.op_profile {args.out} --top 30")


if __name__ == "__main__":
    main()
