#!/usr/bin/env python
"""Regenerate the committed sample artifacts under deviation #10
(stream-indexed sampling uniforms, docs/MIGRATION.md) from the committed
trained checkpoints, on the TPU chip, then byte-verify every file against
a CPU child run — the regeneration discipline that makes a published
sample a reproducible artifact (docs/FIDELITY.md).

Regenerates in place:
  artifacts/short_samples_r2/short_s{0,1}_{0..2}.mid
      params_short23.npz, 3 genre mixtures, 8 bars, seeds 0 and 1
  artifacts/real_corpus_r3/real_trained_{0..2}.mid
      real_corpus_r3/params.npz, styles 0/3/9, 16 bars, seed 0, T=0.75
  artifacts/long_samples_r3/long_{0..2}.mid
      trained_model_r3/params.npz, 3 genre mixtures, 64 bars, seed 0
  artifacts/long_samples_r4/long_{0..2}.mid
      trained_model_r4/params.npz (the replay-correct-corpus flagship),
      3 genre mixtures, 64 bars, seed 0

Run on the TPU box from /root/repo:  python tools/regen_artifacts_r4.py
(`--only SUBSTR` restricts to matching jobs, e.g. --only long_samples_r4).
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")

JOBS = [
    # (out_dir, name_fmt, params_npz, styles_spec, bars, seed, temperature)
    ("short_samples_r2", "short_s0_{i}.mid",
     "trained_model_r3/params_short23.npz", "genres", 8, 0, 1.0),
    ("short_samples_r2", "short_s1_{i}.mid",
     "trained_model_r3/params_short23.npz", "genres", 8, 1, 1.0),
    ("real_corpus_r3", "real_trained_{i}.mid",
     "real_corpus_r3/params.npz", "0,3,9", 16, 0, 0.75),
    ("long_samples_r3", "long_{i}.mid",
     "trained_model_r3/params.npz", "genres", 64, 0, 1.0),
    ("long_samples_r4", "long_{i}.mid",
     "trained_model_r4/params.npz", "genres", 64, 0, 1.0),
]


def _select_jobs(only):
    """`--only SUBSTR` filters the matrix by artifact dir or checkpoint —
    lets a new entry regenerate + verify without re-running all of it."""
    if not only:
        return JOBS
    jobs = [j for j in JOBS if only in j[0] or only in j[2]]
    if not jobs:
        # A typo'd filter must not byte-verify 0 files and exit 0 — the
        # operator would believe the artifact regenerated and verified.
        raise SystemExit(
            f"--only {only!r} matches no jobs; known: "
            + ", ".join(sorted({j[0] for j in JOBS})))
    return jobs


def run_jobs(dest_root: str, only: str = "") -> None:
    import numpy as np

    from music_generator_tpu.config import default_config
    from music_generator_tpu.data.dataset import compute_genre, unclamp_midi
    from music_generator_tpu.generation.sampler import Sampler
    from music_generator_tpu.midi.codec import midi_encode
    from music_generator_tpu.midi.io import write_midifile
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.utils import one_hot
    from tools.check_fidelity import _params_from_npz

    import jax
    cfg = default_config()
    model = DeepJ(cfg)
    print("backend:", jax.default_backend())

    samplers = {}
    for out_dir, name_fmt, params_rel, styles_spec, bars, seed, temp in _select_jobs(only):
        if params_rel not in samplers:
            params = _params_from_npz(model, os.path.join(ART, params_rel))
            samplers[params_rel] = Sampler(model, params)
        sampler = samplers[params_rel]
        if styles_spec == "genres":
            styles = [compute_genre(g, cfg) for g in range(3)]
        else:
            styles = [one_hot(int(s), cfg.num_styles)
                      for s in styles_spec.split(",")]
        result = sampler.generate(styles, num_bars=bars, seed=seed,
                                  temperature=temp)
        dest = os.path.join(dest_root, out_dir)
        os.makedirs(dest, exist_ok=True)
        for i in range(result.notes.shape[0]):
            path = os.path.join(dest, name_fmt.format(i=i))
            mf = midi_encode(unclamp_midi(np.asarray(result.notes[i]), cfg),
                             config=cfg)
            write_midifile(path, mf)
            print("wrote", path)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dest", default=ART,
                        help="artifact root to write into (the CPU child "
                             "writes to a scratch dir for comparison)")
    parser.add_argument("--phase", default="main",
                        choices=["main", "cpu-child"])
    parser.add_argument("--only", default="",
                        help="regenerate/verify only jobs whose artifact "
                             "dir or checkpoint contains this substring")
    args = parser.parse_args(argv)

    if args.phase == "cpu-child":
        import jax
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu"
        run_jobs(args.dest, args.only)
        return

    from music_generator_tpu.utils.compile_cache import enable
    enable()
    run_jobs(ART, args.only)

    # CPU child regenerates the same matrix into a scratch tree; every
    # committed byte must reproduce.
    scratch = os.path.join(REPO, "runs", "regen_r4_cpu")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    subprocess.run([sys.executable, os.path.abspath(__file__),
                    "--phase", "cpu-child", "--dest", scratch,
                    "--only", args.only],
                   check=True, env=env, cwd=REPO)

    mismatches = []
    checked = 0
    for out_dir, name_fmt, *_ in _select_jobs(args.only):
        for i in range(3):
            name = name_fmt.format(i=i)
            a = os.path.join(ART, out_dir, name)
            b = os.path.join(scratch, out_dir, name)
            checked += 1
            if open(a, "rb").read() != open(b, "rb").read():
                mismatches.append(f"{out_dir}/{name}")
    report = {"files": checked, "mismatches": mismatches,
              "identical": not mismatches,
              "discipline": "deviation #10 stream-indexed uniforms (r4)"}
    print(json.dumps(report, indent=2))
    if mismatches:
        raise SystemExit("TPU/CPU byte mismatch — do not commit")

    ran_dirs = {j[0] for j in _select_jobs(args.only)}
    if "long_samples_r3" not in ran_dirs:
        return
    prov = os.path.join(ART, "long_samples_r3", "PROVENANCE.json")
    with open(prov) as f:
        meta = json.load(f)
    meta["verified"] = ("byte-identical to the framework's own CPU run "
                        "with the same settings (TPU==CPU, 3/3 files)")
    meta["rng_discipline"] = (
        "deviation #10 (round 4): stream-indexed uniforms — bytes "
        "independent of batch padding/composition; regenerated from the "
        "same checkpoint, supersedes the r3 bytes")
    with open(prov, "w") as f:
        json.dump(meta, f, indent=2)
    print("updated", prov)


if __name__ == "__main__":
    main()
