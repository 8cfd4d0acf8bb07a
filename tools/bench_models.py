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


def bench_gan():
    """MetricGAN (DPCCN + CMGAN discriminator) step timing at the
    dpcc_init_gan conf envelope (batch 4, 3 s chunks), for each metric
    variant: 'pesq' (jittable on-device P.862 — the TPU-native answer
    to the reference's per-batch host PESQ round trip,
    executor_gan.py:309-337), 'sisdr' (cheap on-device proxy), and
    'pesq_host' (host pure_callback — quantifies the stall the
    reference design pays every batch)."""
    import functools as ft
    import numpy as np

    import jax
    import jax.numpy as jnp

    from wesep_tpu.models import get_model
    from wesep_tpu.models.discriminator import CMGANDiscriminator
    from wesep_tpu.train.losses import si_sdr_loss
    from wesep_tpu.train.schedulers import exponential_decrease
    from wesep_tpu.train.trainer import TrainState, init_train_state, make_optimizer
    from wesep_tpu.train.trainer_gan import (
        make_gan_train_step,
        metric_pesq,
        metric_pesq_callback,
        metric_sisdr_norm,
    )

    batch_n = 4
    t = int(CHUNK_SEC * SR)
    model = get_model("DPCCN")(spk_emb_dim=256, win=512, stride=128,
                               joint_training=False)
    disc = CMGANDiscriminator()
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
    sched = exponential_decrease(num_epochs=150, epoch_iter=1000,
                                 initial_lr=5e-4, final_lr=2.5e-5,
                                 warm_up_epoch=0)
    g_opt = make_optimizer(sched, weight_decay=0.0, clip_grad=5.0)
    d_opt = make_optimizer(sched, weight_decay=0.0, clip_grad=5.0)
    metrics_tbl = {
        "pesq": ft.partial(metric_pesq, fs=SR),
        "sisdr": metric_sisdr_norm,
    }
    # 'pesq_host' (metric_pesq_callback) cannot run through this TPU
    # transport at all: axon_pjrt rejects host callbacks
    # ("UNIMPLEMENTED: ... does not support host send/recv callbacks").
    # The reference's per-batch host-PESQ design (executor_gan.py:
    # 309-337) is therefore not just slow on TPU — it is impossible
    # here; the jittable on-device P.862 is the production path. The
    # would-be stall is still quantified below by timing the host-side
    # P.862 on one batch (the reference pays it serialized per step).
    del metric_pesq_callback  # documented-unsupported on axon
    res = {}
    for name, metric in metrics_tbl.items():
        # the host P.862 costs ~seconds per batch: time it with minimal
        # repetitions (it needs no relay-noise averaging anyway)
        warm, n_steps, windows = (1, 2, 1) if name == "pesq_host" else (3, 5, 3)
        raw = make_gan_train_step(model, disc, g_opt, d_opt,
                                  [si_sdr_loss], metric_fn=metric)
        step = jax.jit(raw, donate_argnums=(0,))
        g_state = init_train_state(model, jax.random.PRNGKey(0), batch,
                                   g_opt)
        d_vars = disc.init(
            {"params": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            batch["wav_targets"], batch["wav_mix"], train=True,
        )
        d_state = TrainState(
            params=d_vars["params"],
            batch_stats=d_vars.get("batch_stats", {}),
            opt_state=d_opt.init(d_vars["params"]),
            step=jnp.zeros((), jnp.int32),
        )
        states = (g_state, d_state)
        for _ in range(warm):
            states, m = step(states, batch)
            float(m["loss"])
        elapsed = float("inf")
        for _ in range(windows):
            start = time.perf_counter()
            for _ in range(n_steps):
                states, m = step(states, batch)
            float(m["loss"])
            elapsed = min(elapsed, time.perf_counter() - start)
        sec = elapsed / n_steps
        res[f"gan_dpccn_train_ms_per_step_{name}"] = round(sec * 1e3, 1)
        res[f"gan_dpccn_train_audio_sec_per_sec_1chip_{name}"] = round(
            batch_n * CHUNK_SEC / sec, 1)
    # host-side P.862 cost for one batch = the per-step stall the
    # reference's callback design would pay (fully serialized there)
    from wesep_tpu.utils.score import cal_PESQ_norm

    est = np.asarray(batch["wav_mix"])
    ref = np.asarray(batch["wav_targets"])
    start = time.perf_counter()
    for i in range(batch_n):
        cal_PESQ_norm(est[i], ref[i], SR)
    res["gan_dpccn_host_pesq_ms_per_batch"] = round(
        (time.perf_counter() - start) * 1e3, 1)
    return res
