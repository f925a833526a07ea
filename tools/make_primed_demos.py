#!/usr/bin/env python
"""Primed-continuation demo artifacts: the real-corpus model continues
the reference's OWN published pieces.

For each genre, the first `--prime-bars` bars of the first published
piece (ref: archives/v1/long_samples/ — the showcase music DeepJ's
authors shipped) are decoded, clamped, and teacher-forced through the
streaming sampler state; the real-corpus flagship checkpoint
(artifacts/real_corpus_r3/params.npz, trained on exactly these nine
pieces — docs/TRAINING.md "Real-corpus training") then composes
`--cont-bars` new bars in that style, conditioned on the genre's staged
style slot (0/3/9, tools/run_real_corpus.py::stage_real_corpus).

Writes artifacts/primed_demos_r4/:
  primed_<Genre>.mid  — the (clamped) prime + the generated continuation
  provenance.json     — prime source/length, checkpoint, seed, T, hashes

Then re-runs itself in a CPU child (JAX_PLATFORMS=cpu) and byte-compares
— the same regeneration discipline every committed sample follows
(docs/FIDELITY.md); tests/test_trained_artifact.py pins one of the files
in CI.

Run on the TPU box from /root/repo:  python tools/make_primed_demos.py
"""

import argparse
import hashlib
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DIR = "/root/reference/archives/v1/long_samples"
GENRES = [("Baroque", 0), ("Classical", 3), ("Romantic", 9)]
PARAMS = os.path.join(REPO, "artifacts", "real_corpus_r3", "params.npz")
SEED = 0
TEMPERATURE = 0.75


def build_files(out_dir: str, prime_bars: int, cont_bars: int) -> dict:
    import numpy as np

    from music_generator_tpu.config import default_config
    from music_generator_tpu.data.dataset import clamp_midi, unclamp_midi
    from music_generator_tpu.generation.sampler import Sampler
    from music_generator_tpu.midi.codec import midi_decode, midi_encode
    from music_generator_tpu.midi.io import read_midifile, write_midifile
    from music_generator_tpu.models.deepj import DeepJ
    from music_generator_tpu.utils import one_hot
    from tools.check_fidelity import _params_from_npz

    cfg = default_config()
    model = DeepJ(cfg)
    sampler = Sampler(model, _params_from_npz(model, PARAMS))
    os.makedirs(out_dir, exist_ok=True)

    records = {}
    for genre, sid in GENRES:
        src = os.path.join(REF_DIR, f"{genre} 1.mid")
        roll = clamp_midi(midi_decode(read_midifile(src),
                                      cfg.midi_max_notes, config=cfg), cfg)
        prime = roll[:prime_bars * cfg.notes_per_bar].astype(np.float32)
        res = sampler.generate([one_hot(sid, cfg.num_styles)],
                               num_bars=cont_bars, seed=SEED,
                               temperature=TEMPERATURE, prime=prime)
        full = np.concatenate([prime, res.notes[0]], axis=0)
        path = os.path.join(out_dir, f"primed_{genre}.mid")
        write_midifile(path, midi_encode(unclamp_midi(full, cfg),
                                         config=cfg))
        records[genre] = {
            "prime_source": f"archives/v1/long_samples/{genre} 1.mid",
            "prime_bars": prime_bars,
            "continuation_bars": cont_bars,
            "style_slot": sid,
            "seed": SEED,
            "temperature": TEMPERATURE,
            "params": os.path.relpath(PARAMS, REPO),
            "sha256": hashlib.sha256(open(path, "rb").read()).hexdigest(),
        }
        print(f"{genre}: primed {prime.shape[0]} steps -> "
              f"{os.path.relpath(path, REPO)}")
    return records


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "primed_demos_r4"))
    parser.add_argument("--prime-bars", type=int, default=8)
    parser.add_argument("--cont-bars", type=int, default=8)
    parser.add_argument("--child", action="store_true",
                        help="(internal) CPU verification pass")
    args = parser.parse_args(argv)

    if args.child:
        import jax
        jax.config.update("jax_platforms", "cpu")
        build_files(args.out + ".cpu", args.prime_bars, args.cont_bars)
        return

    from music_generator_tpu.utils.compile_cache import enable
    enable()
    import jax
    records = build_files(args.out, args.prime_bars, args.cont_bars)

    # CPU child + byte comparison (the committed-artifact discipline).
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    subprocess.run([sys.executable, os.path.abspath(__file__),
                    "--out", args.out, "--prime-bars", str(args.prime_bars),
                    "--cont-bars", str(args.cont_bars), "--child"],
                   check=True, env=env, cwd=REPO)
    mismatch = []
    for genre, _ in GENRES:
        a = os.path.join(args.out, f"primed_{genre}.mid")
        b = os.path.join(args.out + ".cpu", f"primed_{genre}.mid")
        if open(a, "rb").read() != open(b, "rb").read():
            mismatch.append(genre)
    provenance = {
        "tool": "tools/make_primed_demos.py",
        "backend": jax.default_backend(),
        "byte_verified_vs_cpu": not mismatch,
        "mismatches": mismatch,
        "files": records,
    }
    with open(os.path.join(args.out, "provenance.json"), "w") as f:
        json.dump(provenance, f, indent=2)
    print(json.dumps(provenance, indent=2))
    assert not mismatch, f"CPU verification failed: {mismatch}"


if __name__ == "__main__":
    main()
