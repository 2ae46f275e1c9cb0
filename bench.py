#!/usr/bin/env python
"""Headline benchmark: GAIL-hopper training throughput (env-steps/s).

Runs the real pipeline — host MuJoCo hopper env, device-resident replay,
fully-jitted GAIL discriminator + SAC update at the reference's 1:1
step:update ratio — and reports steady-state env-steps/s (trace/compile and
warmup excluded via the training.timing_skip_steps window).

`vs_baseline` compares against the reference's measured hot-loop rate on
this host (bench_baseline.json; the reference publishes no throughput
numbers — BASELINE.md). Prints ONE JSON line.

Env knobs: BENCH_NUM_ENVS (default 512 batched envs — the measured
throughput knee on a v5e chip; 1 = reference-parity serial acting — either
way the 1 update : 1 env-step ratio is preserved), BENCH_WINDOWS (default
6 — number of internal steady windows; the reported value is their
MEDIAN), BENCH_STEPS / BENCH_WARMUP (per-window / warmup env-steps, scale
with num_envs by default), BENCH_PLATFORM (pin jax backend),
BENCH_ENV_BACKEND (default auto: in-repo C++ stepper when buildable, else
gymnasium).
"""

import json
import os


def main():
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    # Persistent compile cache: on the tunneled-TPU link a single trivial
    # compile can take minutes, so cache across processes/rounds.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from iltpu.config import load_config
    from iltpu.trainer import Trainer

    num_envs = int(os.environ.get("BENCH_NUM_ENVS", 512))
    # Defaults scale with the env batch so each measured window covers a
    # few hundred fused iterations past warmup at any num_envs.
    # BENCH_STEPS is PER-WINDOW; BENCH_WINDOWS consecutive steady windows
    # are measured inside this one invocation and the MEDIAN window rate is
    # the headline value (min/max reported alongside). One invocation used
    # to take a single ~7s window — a lottery draw against chip-side
    # contention on the shared tunneled v5e (four rounds of driver captures
    # spanned 7.5-11.1k on identical code, docs/PERF.md). K longer windows
    # + median makes the artifact a statistic, not a sample.
    windows = int(os.environ.get("BENCH_WINDOWS", 6))
    steps = int(os.environ.get("BENCH_STEPS", max(4000, 240 * num_envs)))
    warmup = int(os.environ.get("BENCH_WARMUP", max(800, 32 * num_envs)))
    env_backend = os.environ.get("BENCH_ENV_BACKEND", "auto")
    # Pipelined acting (device updates overlap env stepping; params stale by
    # one iteration) is the framework's intended production mode. Host
    # acting (numpy sampling from async-synced params) exists for hosts
    # where link latency dominates; on THIS 2-core host it loses — the BLAS
    # forward steals CPU from the physics threads (measured 5.2k vs 9.0k
    # steps/s at 512 envs) — so it defaults off.
    pipeline = os.environ.get("BENCH_PIPELINE", "1") != "0"
    host_acting = os.environ.get("BENCH_HOST_ACTING", "0") != "0"
    prng = os.environ.get("BENCH_PRNG", "rbg")  # hardware RNG: perf mode
    # Fused Pallas update kernels (iltpu/ops/pallas_{sac,gail}.py) — the
    # whole SAC step and the GAIL discriminator step as one kernel each.
    # Default ON: measured 10649 env-steps/s vs 9263 for the XLA-fused
    # path at 512 envs on the v5e bench chip (A/B 2026-08-21).
    pallas = os.environ.get("BENCH_PALLAS", "1") != "0"
    # Fused update scan: leaf-layout carry + pre-scan vmapped RNG for the
    # whole update scan (trainer fast path; bit-identical to the per-step
    # Pallas path). BENCH_FUSED=0 A/Bs the per-step scan.
    fused = pallas and os.environ.get("BENCH_FUSED", "1") != "0"
    # K-blocked update kernel: K sequential micro-updates per Pallas
    # kernel with the state resident in VMEM (exact sequential
    # semantics). Default 1 (per-step fused scan) until the K-block
    # on-chip A/B lands; BENCH_BLOCK=K opts in.
    blockk = int(os.environ.get("BENCH_BLOCK", 1)) if fused else 1
    # BENCH_TUNED=1: bench the QUALITY configuration — the tuned GAIL@10
    # overlay (Mixup loss + AIRL reward head, batch 512) that produces the
    # best validated scores (RESULTS.md), so the headline throughput claim
    # covers the config you would actually run. The fused Pallas
    # discriminator kernel covers Mixup + entropy bonus + AIRL since
    # round 3; BENCH_PALLAS=0 A/Bs the XLA-fused path for either config.
    tuned = os.environ.get("BENCH_TUNED", "0") != "0"
    pallas_disc = pallas
    trajectories = 10 if tuned else 5  # tuned: the validated GAIL_10 overlay

    def make(n_steps, seed, skip=0):
        cfg = load_config(
            [
                "algorithm=GAIL",
                "env=hopper",
                f"env_backend={env_backend}",
                f"training.pipeline={str(pipeline).lower()}",
                f"training.host_acting={str(host_acting).lower()}",
                f"training.sac_pallas={str(pallas).lower()}",
                f"training.disc_pallas={str(pallas_disc).lower()}",
                f"training.fused_update_scan={str(fused).lower()}",
                f"training.update_block={blockk}",
                f"training.timing_skip_steps={skip}",
                f"training.timing_marks={windows}",
                f"prng={prng}",
                f"seed={seed}",
                f"num_envs={num_envs}",
                f"steps={n_steps}",
                "training.start=100",
                f"evaluation.interval={n_steps + 1}",  # no eval inside the bench
                "evaluation.episodes=1",
                "logging.interval=0",
                "memory.size=100000",
                f"imitation.trajectories={trajectories}",
                "check_time_usage=true",
                "expert_data.source=synthetic",
            ],
            use_tuned=tuned,
        )
        return Trainer(cfg, out_dir="/tmp/iltpu_bench", file_prefix=f"s{seed}_")

    # One run; the steady-state region [warmup, warmup+windows*steps)
    # excludes trace/compile-cache-load and warmup physics
    # (training.timing_skip_steps) and is split into `windows` consecutive
    # synced windows by training.timing_marks.
    trainer = make(warmup + windows * steps, seed=1, skip=warmup)
    trainer.run()
    marks = trainer.metrics.get("steady_marks") or []
    rates = [
        (s1 - s0) / (t1 - t0)
        for (s0, t0), (s1, t1) in zip(marks, marks[1:])
        if t1 > t0
    ]
    if rates:
        rates.sort()
        n = len(rates)
        value = (
            rates[n // 2] if n % 2 else 0.5 * (rates[n // 2 - 1] + rates[n // 2])
        )
    else:  # fallback: the whole-region rate (e.g. BENCH_WINDOWS=0)
        value = trainer.metrics["steady_env_steps"] / trainer.metrics["steady_time"]
    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    with open(baseline_path) as f:
        baseline = json.load(f)["reference_env_steps_per_s"]

    print(
        json.dumps(
            {
                "metric": (
                    "GAIL-hopper tuned-config env-steps/s (1:1 step:update)"
                    if tuned
                    else "GAIL-hopper env-steps/s (1:1 step:update)"
                ),
                "value": round(value, 2),
                "unit": "env-steps/s",
                "vs_baseline": round(value / baseline, 3),
                "windows": len(rates),
                "window_min": round(min(rates), 2) if rates else None,
                "window_max": round(max(rates), 2) if rates else None,
                # The shared tunneled v5e occasionally enters a sustained
                # ~10x hard-throttle mode (measured 1,058 +-0.2% for a
                # whole 14-min invocation between two normal-speed runs,
                # docs/PERF.md "chip-weather" section). A tight window
                # band at a small fraction of the healthy 9-11k band is
                # that mode, not a code regression — flag it so the
                # artifact self-identifies.
                "throttle_suspected": bool(
                    rates
                    and max(rates) < 4000
                    and (max(rates) - min(rates)) < 0.05 * value
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
