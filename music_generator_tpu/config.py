"""Configuration for the whole framework.

One frozen dataclass reproducing every value of the reference's config module
(ref: constants.py:1-84) exactly, plus TPU-specific knobs the reference never
needed (mesh shape, dtype policy, kernel selection).  The reference's config
mechanism is "edit constants.py and star-import it everywhere"; here the
config is an explicit immutable object threaded through every API, with
`default_config()` matching the reference values.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Mapping, Tuple

# ---------------------------------------------------------------------------
# Style taxonomy (ref: constants.py:4-40): 3 genres, 23 composer styles.
# ---------------------------------------------------------------------------

GENRES: Tuple[str, ...] = ("baroque", "classical", "romantic")

STYLES: Tuple[Tuple[str, ...], ...] = (
    (
        "data/baroque/bach",
        "data/baroque/handel",
        "data/baroque/pachelbel",
    ),
    (
        "data/classical/burgmueller",
        "data/classical/clementi",
        "data/classical/haydn",
        "data/classical/beethoven",
        "data/classical/brahms",
        "data/classical/mozart",
    ),
    (
        "data/romantic/balakirew",
        "data/romantic/borodin",
        "data/romantic/brahms",
        "data/romantic/chopin",
        "data/romantic/debussy",
        "data/romantic/liszt",
        "data/romantic/mendelssohn",
        "data/romantic/moszkowski",
        "data/romantic/mussorgsky",
        "data/romantic/rachmaninov",
        "data/romantic/schubert",
        "data/romantic/schumann",
        "data/romantic/tchaikovsky",
        "data/romantic/tschai",
    ),
)


@dataclasses.dataclass(frozen=True)
class Config:
    """Every hyperparameter of the framework.

    Field-for-field parity with the reference's constants (ref:
    constants.py:42-84); defaults below are exactly the reference's values.
    TPU-only fields are grouped at the bottom.
    """

    # --- Style taxonomy -------------------------------------------------
    genres: Tuple[str, ...] = GENRES
    styles: Tuple[Tuple[str, ...], ...] = STYLES

    # --- MIDI resolution (ref: constants.py:44-47) ----------------------
    default_res: int = 96          # ticks per quarter note of typical input
    midi_max_notes: int = 128      # full MIDI pitch space
    max_velocity: int = 127

    # --- Pitch range (ref: constants.py:49-56) --------------------------
    num_octaves: int = 4
    octave: int = 12
    min_note: int = 36             # MIDI note number of lowest modeled pitch

    # --- Time grid (ref: constants.py:58-63) ----------------------------
    beats_per_bar: int = 4
    notes_per_beat: int = 4        # 16th-note grid

    # --- Training geometry (ref: constants.py:65-67) --------------------
    batch_size: int = 16
    bars_per_seq: int = 8          # SEQ_LEN = 8 bars * 16 steps = 128

    # --- Model dims (ref: constants.py:69-77) ---------------------------
    octave_units: int = 64
    style_units: int = 64
    note_units: int = 3            # (play, replay, volume)
    time_axis_units: int = 256
    note_axis_units: int = 128
    time_axis_layers: int = 2
    note_axis_layers: int = 2

    # --- Dropout (ref: model.py:128) ------------------------------------
    input_dropout: float = 0.2
    dropout: float = 0.5

    # --- Optimizer: Keras 'nadam' defaults (ref: model.py:152) ----------
    learning_rate: float = 2e-3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-7              # keras.backend.epsilon era default
    schedule_decay: float = 0.004

    # --- Training driver (ref: train.py:22-29) --------------------------
    epochs: int = 1000
    early_stop_patience: int = 5

    # --- Paths (ref: constants.py:79-84) --------------------------------
    out_dir: str = "out"

    # --- TPU-native knobs (no reference counterpart) --------------------
    # Compute dtype for matmuls/activations; params and optimizer state stay
    # float32.  bfloat16 keeps the MXU fed at full rate.
    compute_dtype: str = "bfloat16"
    # Name of the data-parallel mesh axis.
    data_axis: str = "data"
    # Use the fused Pallas LSTM kernel where applicable ("auto" picks it on
    # TPU backends, plain lax.scan elsewhere).
    lstm_kernel: str = "auto"      # "auto" | "pallas" | "xla"
    # LSTM gate recurrent activation.  "sigmoid" is this framework's
    # default; "hard_sigmoid" is Keras 2's clip(0.2x+0.5, 0, 1) — the
    # reference era's LSTM default, offered so genuine Keras-2-trained
    # weights run with their original gate math (deviation #12,
    # docs/MIGRATION.md; measured vs real Keras by tools/keras_oracle.py).
    # Runs fused: the Pallas kernels implement both gate flavors (r5;
    # parity pinned by tests/test_hard_gates.py).
    lstm_recurrent_activation: str = "sigmoid"
    # Octave-transpose data augmentation (flag off for parity runs).
    transpose_augment: int = 0     # max semitone shift (0 disables)
    # Time-axis recurrence family.  "lstm" is the reference architecture
    # (the shipped contract); "linear" swaps in a minGRU-style gated
    # LINEAR recurrence (ops/linear_scan.py) whose time dimension runs as
    # an O(log T) associative scan with no recurrent matmul — the round-4
    # "move the architectural ceiling" study (docs/PERFORMANCE.md,
    # artifacts/parallel_scan_r4/).  OFF by default: different parameters,
    # different (non-reference) model family.
    time_axis_kind: str = "lstm"   # "lstm" | "linear"
    # Hardware RBG PRNG for training dropout masks (generation sampling
    # always stays on the cross-platform threefry PRNG).
    fast_dropout_rng: bool = True
    # Fuse both LSTM layers of an axis into one Pallas kernel (in-kernel
    # inter-layer dropout); applies when lstm_kernel resolves to "pallas".
    fused_axis_kernel: bool = True
    # v3 biaxial kernels (ops/pallas_biax.py): ALL dropout sites, style
    # adds, the inter-stack relayout, the shift-chosen concat, and the
    # output heads fused on-chip.  Takes precedence over fused_axis_kernel
    # for the training/eval forward when applicable.
    fused_biax_v3: bool = True
    # Fuse the generation pitch loop (note-axis cells + heads + sampling)
    # into one Pallas kernel when the generation batch is at most
    # fused_gen_max_batch.  Since the kernel adopted the XLA path's
    # lax.logistic sigmoid it adds no divergence of its own (trained
    # checkpoints certify 32/32 byte-identical on BOTH paths —
    # docs/FIDELITY.md).  Still OFF by default: the default path runs the
    # SAME scan algorithm as the CPU oracle by construction, the cleanest
    # cross-backend contract; opt in for latency-sensitive serving
    # (0.46 vs 0.62 ms/timestep single-stream at 32 bars).
    fused_gen_kernel: bool = False
    fused_gen_max_batch: int = 8
    # Backend-stable generation (the BASELINE.md byte-identity target: the
    # TPU chip's .mid output must match the framework's own CPU run at a
    # fixed seed).  Generation compute runs in this dtype with this matmul
    # precision — float32/highest keeps Bernoulli draws off bf16 knife
    # edges; training keeps compute_dtype (bf16) untouched.  See
    # docs/FIDELITY.md for the verified cross-backend results.
    gen_dtype: str = "float32"
    gen_matmul_precision: str = "highest"
    # Opt-in deviation #9 (docs/MIGRATION.md): snap sampled volumes to the
    # 1/127 MIDI-velocity grid inside generation (round(v*127)/127), so the
    # emitted velocity byte is a lossless function of the stored float
    # (every f32 grid point truncates back to its own integer) and the
    # drift knife-edge moves from the encoder's truncation boundaries —
    # where trained volume outputs cluster, because training data lives ON
    # the grid — to the rounding midpoints between them.  OFF by default:
    # the raw copy-through is the reference's semantics (ref:
    # generate.py:48,55) and the published certified artifacts pin it.
    gen_volume_quantize: bool = False
    # Compact device->host transfer of sampled volumes: ship the velocity
    # byte floor(v*max_velocity) as uint8 and reconstruct the exact
    # f32(k/max_velocity) grid float on the host.  The EMITTED .mid bytes
    # are provably unchanged (the encoder truncates int(v*max_velocity),
    # and every grid point truncates back to its own k —
    # test_compact_transfer_same_midi_bytes), but the returned roll's
    # volume FLOATS become the grid representative of the raw head output,
    # so it is OFF by default (the certified artifacts pin raw floats) and
    # ON in serving (which returns .mid bytes only and is transfer-bound
    # at large batch through a tunneled TPU: 5 -> 2 bytes per roll cell).
    gen_compact_transfer: bool = False

    # --- Derived values (ref: constants.py:42,55-56,63,67) --------------
    @property
    def num_styles(self) -> int:
        return sum(len(s) for s in self.styles)

    @property
    def max_note(self) -> int:
        return self.min_note + self.num_octaves * self.octave

    @property
    def num_notes(self) -> int:
        return self.max_note - self.min_note

    @property
    def notes_per_bar(self) -> int:
        return self.notes_per_beat * self.beats_per_bar

    @property
    def seq_len(self) -> int:
        return self.bars_per_seq * self.notes_per_bar

    # --- Derived paths (ref: constants.py:80-84) ------------------------
    @property
    def model_dir(self) -> str:
        return os.path.join(self.out_dir, "models")

    @property
    def model_file(self) -> str:
        return os.path.join(self.out_dir, "model.ckpt")

    @property
    def samples_dir(self) -> str:
        return os.path.join(self.out_dir, "samples")

    @property
    def cache_dir(self) -> str:
        return os.path.join(self.out_dir, "cache")

    @property
    def log_dir(self) -> str:
        return os.path.join(self.out_dir, "logs")

    # --- Style helpers ---------------------------------------------------
    @property
    def flat_styles(self) -> Tuple[str, ...]:
        """All style directories flattened (ref: dataset.py:51)."""
        return tuple(y for x in self.styles for y in x)

    @property
    def genre_of_style(self) -> Tuple[int, ...]:
        """Genre index of each flattened style."""
        return tuple(g for g, s in enumerate(self.styles) for _ in s)

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)

    def to_dict(self) -> Mapping[str, object]:
        return dataclasses.asdict(self)


def default_config() -> Config:
    """The reference configuration (ref: constants.py)."""
    return Config()


def test_config(**overrides) -> Config:
    """A small config for unit tests: tiny dims, CPU-friendly."""
    base = dict(
        batch_size=2,
        bars_per_seq=1,
        octave_units=8,
        style_units=8,
        time_axis_units=16,
        note_axis_units=8,
        compute_dtype="float32",
        lstm_kernel="xla",
    )
    base.update(overrides)
    return Config(**base)
