"""Per-model training-step throughput benchmark (TPU).

Measures the full compiled train step (fwd + bwd + per-param clip + Adam)
for each flagship model at its reference recipe envelope and merges the
results into BENCH_DETAILS.json. The reference publishes no throughput
numbers; these are the self-measured baseline table of BASELINE.md.

    python -m tools.bench_models [--models bsrnn,spexplus,dpccn,tfgridnet]
"""

import argparse
import json
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference training envelopes: (model ctor name, kwargs, batch, note)
# batch sizes per the v2 confs (A800 settings), 3 s chunks @16 kHz.
ENVELOPES = {
    "bsrnn": dict(
        model="BSRNN",
        args=dict(spk_emb_dim=256, sr=16000, win=512, stride=128,
                  feature_dim=128, num_repeat=6, use_spk_transform=False,
                  spk_fuse_type="multiply", multi_fuse=False,
                  joint_training=False, remat=False),
        batch=16,
    ),
    "spexplus": dict(
        model="ConvTasNet",
        args=dict(L=20, N=256, X=8, R=4, B=256, H=512, P=3,
                  norm="gLN", activate="relu", causal=False,
                  skip_con=False, spk_emb_dim=256,
                  spk_fuse_type="concatConv", encoder_type="Multi",
                  decoder_type="Multi", joint_training=False),
        batch=8,
        # multi-scale decoder: SI-SDR on est1/est2/est3, 0.8/0.1/0.1
        # (confs/spexplus.yaml:27-30)
        loss_posi=((0, 1, 2),),
        loss_weight=((0.8, 0.1, 0.1),),
    ),
    "dpccn": dict(
        model="DPCCN",
        args=dict(spk_emb_dim=256, win=512, stride=128,
                  joint_training=False),
        batch=8,
    ),
    "tfgridnet": dict(
        model="TFGridNet",
        args=dict(n_srcs=1, sr=16000, n_fft=128, stride=64, n_layers=6,
                  lstm_hidden_units=192, attn_n_head=4,
                  attn_approx_qk_dim=512, emb_dim=48, emb_ks=4, emb_hs=1,
                  spk_emb_dim=256, spk_fuse_type="multiply",
                  joint_training=False, remat=False),
        batch=2,
    ),
}

# patch-matmul conv variant (ops/patch_conv.py): lane-packs P adjacent
# freq outputs so the dense 16-64-channel convs fill the 128-lane MXU
ENVELOPES["dpccn_patch"] = dict(
    model="DPCCN",
    args={**ENVELOPES["dpccn"]["args"], "conv_impl": "patch"},
    batch=8,
)

# fused Pallas conv+ELU+IN blocks (ops/pallas_conv2d.py)
ENVELOPES["dpccn_pallas"] = dict(
    model="DPCCN",
    args={**ENVELOPES["dpccn"]["args"], "conv_impl": "pallas"},
    batch=8,
)

# scan_layers variants: the 6 blocks compile as ONE lax.scan body
# (~6x smaller HLO), sized to fit batch-4/8 remat-free graphs through the
# relay's compile helper (VERDICT round-2 #8)
for _b in (2, 4, 8):
    ENVELOPES[f"tfgridnet_scan_b{_b}"] = dict(
        model="TFGridNet",
        args={**ENVELOPES["tfgridnet"]["args"], "scan_layers": True},
        batch=_b,
    )
    # remat-free b4/b8 exceed single-chip HBM (751-frame per-layer
    # activation stacks); the remat+scan variants are the large-batch
    # operating points
    ENVELOPES[f"tfgridnet_scan_remat_b{_b}"] = dict(
        model="TFGridNet",
        args={**ENVELOPES["tfgridnet"]["args"], "scan_layers": True,
              "remat": True},
        batch=_b,
    )

CHUNK_SEC = 3.0
SR = 16000


def bench_one(name, env):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from wesep_tpu.models import get_model
    from wesep_tpu.train.losses import si_sdr_loss
    from wesep_tpu.train.schedulers import exponential_decrease
    from wesep_tpu.train.trainer import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

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
    raw_step = make_train_step(model, optimizer, [si_sdr_loss],
                               loss_posi=env.get("loss_posi", ((0,),)),
                               loss_weight=env.get("loss_weight", ((1.0,),)),
                               compute_dtype=jnp.bfloat16)
    step = jax.jit(raw_step, donate_argnums=(0,))
    state = init_train_state(model, jax.random.PRNGKey(0), batch, optimizer)
    for _ in range(5):
        state, metrics = step(state, batch)
        float(metrics["loss"])
    # best of 3 windows: the remote relay occasionally injects one slow
    # round trip, which a single window would report as a regression
    n_steps = 10
    elapsed = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(n_steps):
            state, metrics = step(state, batch)
        float(metrics["loss"])  # forces the whole dependency chain
        elapsed = min(elapsed, time.perf_counter() - start)
    sec = elapsed / n_steps
    res = {
        f"{name}_train_ms_per_step": round(sec * 1e3, 1),
        f"{name}_train_audio_sec_per_sec_1chip": round(
            batch_n * CHUNK_SEC / sec, 1),
    }
    res.update(step_mfu(name, step, raw_step, state, batch, sec))
    return res


def step_mfu(name, step, raw_step, state, batch, sec_per_step):
    """MFU of the compiled train step.

    XLA's compiled.cost_analysis() is blind to FLOPs inside Pallas custom
    calls (the round-3 gflops/MFU "collapse" was exactly that: the layer
    kernel moved the gate projections in-kernel and the XLA-visible count
    dropped while real utilization improved — ADVICE r3). Total model
    FLOPs = XLA-visible + the kernels' analytic matmul FLOPs recorded at
    trace time by ops/pallas_lstm's ledger. The ledger is filled by a
    FRESH abstract trace of the unjitted step (jax.eval_shape) — the
    jitted function's trace is cached after the first call and would not
    re-run the recording Python. v5e peak: 197 TFLOP/s bf16.

    Two MFU keys (VERDICT r4 #8): mfu_exec counts EXECUTED MXU FLOPs,
    which include the backward kernels' in-kernel gate recompute (a
    memory-saving implementation choice, ~1/3 of the kernel backward);
    mfu_model counts only the strict model FLOPs (fwd + required dx/dW).
    """
    try:
        import jax

        from wesep_tpu.ops import pallas_lstm

        pallas_lstm.reset_flop_ledger()
        # fresh lambda: eval_shape of the already-jitted fn object would
        # hit the cached jaxpr and never re-run the recording Python
        jax.eval_shape(lambda s, b: raw_step(s, b), state, batch)
        kernel_flops = pallas_lstm.flop_ledger()
        kernel_model_flops = pallas_lstm.model_flop_ledger()
        compiled = step.lower(state, batch).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        xla_flops = float(cost.get("flops", 0.0))
        flops = xla_flops + kernel_flops
        model_flops = xla_flops + kernel_model_flops
        if flops <= 0:
            return {}
        peak = 197e12
        return {
            f"{name}_train_gflops_per_step": round(flops / 1e9, 1),
            f"{name}_train_pallas_gflops_per_step": round(
                kernel_flops / 1e9, 1),
            f"{name}_train_mfu_exec_pct_v5e_bf16": round(
                flops / sec_per_step / peak * 100, 2),
            f"{name}_train_mfu_model_pct_v5e_bf16": round(
                model_flops / sec_per_step / peak * 100, 2),
        }
    except Exception:
        return {}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", default=",".join(ENVELOPES))
    args = parser.parse_args()

    from wesep_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    details_path = os.path.join(REPO, "BENCH_DETAILS.json")
    for name in args.models.split(","):
        try:
            res = bench_one(name, ENVELOPES[name])
        except Exception as e:  # compile-helper flakes: record and go on
            print(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        print(json.dumps(res))
        details = {}
        if os.path.exists(details_path):
            with open(details_path) as f:
                details = json.load(f)
        details.update(res)
        with open(details_path, "w") as f:
            json.dump(details, f, indent=1)


if __name__ == "__main__":
    main()
