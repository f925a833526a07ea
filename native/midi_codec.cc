// Native MIDI → piano-roll decoder.
//
// The framework's host-side native component: parses Standard MIDI Files and
// decodes them into the (play, replay, volume) piano roll with EXACTLY the
// same semantics as music_generator_tpu/midi/codec.py (which itself preserves
// the reference's quirks — see that module's docstring; ref: midi_util.py:97-191).
// The Python wrapper (music_generator_tpu/midi/native.py) calls this through
// ctypes; because the work happens outside the GIL, a Python thread pool gets
// true parallel corpus decoding.
//
// Implementation is a direct tick-cursor simulation (not a translation of the
// reference's buffer-list algorithm): per tick, apply events (replay rule
// suppressed at frame-boundary ticks), accumulate window max-volume /
// any-replay, emit a frame per `step` ticks; the tail frame takes the
// window-start snapshot for volume.
//
// Build: make -C native   (produces libdeepj_midi.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr int kClasses = 128;

// Hard bound on decoded frames per track: ~18 hours of music at the
// reference's 16th-note grid — far beyond any real piece, but small enough
// that a corrupted delta-tick can no longer drive an hours-long decode loop
// and a tens-of-GB allocation (which would abort the process with an
// uncatchable std::bad_alloc through the ctypes boundary).
constexpr uint64_t kMaxFrames = 1u << 20;

struct Event {
  uint32_t tick;     // delta ticks
  uint8_t status;    // full status byte (or 0xFF for meta)
  uint8_t meta_type; // for meta events
  uint8_t d0, d1;    // data bytes
};

struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  uint8_t u8() {
    if (p >= end) { ok = false; return 0; }
    return *p++;
  }
  uint32_t u16() { uint32_t a = u8(), b = u8(); return (a << 8) | b; }
  uint32_t u32() { uint32_t a = u16(), b = u16(); return (a << 16) | b; }
  uint32_t varlen() {
    // SMF bounds a variable-length quantity at 4 bytes (max 0x0FFFFFFF).
    // A 5th continuation byte is a malformed file: fail the parse (the
    // Python parser raises at the same bound) rather than truncating and
    // resuming mid-stream misaligned.
    uint32_t v = 0;
    for (int i = 0; i < 4; ++i) {
      uint8_t b = u8();
      v = (v << 7) | (b & 0x7F);
      if (!(b & 0x80)) return v;
    }
    ok = false;
    return v;
  }
  void skip(uint32_t n) {
    if (p + n > end) { ok = false; p = end; } else { p += n; }
  }
};

// Parse one MTrk body into note-relevant events (others keep only ticks).
static bool parse_track(Reader r, std::vector<Event>* out) {
  uint8_t running = 0;
  while (r.p < r.end && r.ok) {
    uint32_t tick = r.varlen();
    uint8_t status = r.u8();
    if (status < 0x80) {  // running status
      if (!running) return false;
      --r.p;
      status = running;
    }
    Event ev{tick, status, 0, 0, 0};
    if (status == 0xFF) {
      running = 0;
      ev.meta_type = r.u8();
      uint32_t len = r.varlen();
      r.skip(len);
      out->push_back(ev);
      // EndOfTrack closes the track, but only if everything up to and
      // including it parsed cleanly (the varint/length reads above may
      // have tripped r.ok) — the Python parser raises on the same bytes,
      // and the two parsers must accept the identical file set.
      if (ev.meta_type == 0x2F) return r.ok;
    } else if (status == 0xF0 || status == 0xF7) {
      running = 0;
      uint32_t len = r.varlen();
      r.skip(len);
      out->push_back(ev);
    } else {
      uint8_t hi = status >> 4;
      // System-common 0xF1-0xFE: not valid SMF track content and not a
      // channel event — fail the parse (the Python parser raises on the
      // same bytes) instead of consuming two data bytes and letting the
      // stray byte become running status, which silently shifts every
      // following event into the roll.
      if (hi == 0xF) return false;
      running = status;
      int nbytes = (hi == 0xC || hi == 0xD) ? 1 : 2;
      ev.d0 = r.u8();
      if (nbytes == 2) ev.d1 = r.u8();
      out->push_back(ev);
    }
  }
  return r.ok;
}

// Decode one track's events into frames (volume + replay), matching
// codec.py::_decode_track.
//
// Scheme: a tick's state only counts toward its window's max once the cursor
// LEAVES that tick (same-tick events collapse to their final value, like the
// reference's single buffer entry per tick).  Windows close when the cursor
// crosses a multiple of `step`; the tail frame reports the snapshot taken at
// its first tick instead of the max.
// Returns false when the frame bound is exceeded (malformed tick data).
static bool decode_track(const std::vector<Event>& events, int step,
                         std::vector<double>* volume,
                         std::vector<double>* replay) {
  double cur[kClasses] = {0};
  double prev[kClasses] = {0};      // state at tick-1 (for the replay rule)
  double start_snap[kClasses] = {0};// state at the current window's first tick
  double win_max[kClasses] = {0};
  uint8_t win_replay[kClasses] = {0};

  volume->clear();
  replay->clear();

  uint64_t cur_tick = 0;

  auto close_window = [&]() {
    size_t base = volume->size();
    volume->resize(base + kClasses);
    replay->resize(base + kClasses);
    for (int pclass = 0; pclass < kClasses; ++pclass) {
      (*volume)[base + pclass] = win_max[pclass];
      (*replay)[base + pclass] = win_replay[pclass] ? 1.0 : 0.0;
    }
    std::memset(win_replay, 0, sizeof(win_replay));
    std::memset(win_max, 0, sizeof(win_max));
  };

  bool bounded = true;
  auto advance_to = [&](uint64_t target) {
    if (target / (uint64_t)step >= kMaxFrames) {
      bounded = false;
      return;
    }
    while (cur_tick < target) {
      // Leaving tick cur_tick: its state is final — fold into the window.
      // Ticks up to the next boundary share this state (no events between),
      // and max-folding is idempotent, so one fold covers the whole hop.
      for (int c = 0; c < kClasses; ++c)
        if (cur[c] > win_max[c]) win_max[c] = cur[c];
      uint64_t next_boundary = (cur_tick / step + 1) * (uint64_t)step;
      uint64_t hop = std::min(target, next_boundary);
      if (hop == next_boundary) {
        close_window();
        // The new window's first tick carries the current state; it will be
        // folded when the cursor leaves it (post any events there).
        std::memcpy(start_snap, cur, sizeof(cur));
      }
      cur_tick = hop;
    }
    std::memcpy(prev, cur, sizeof(cur));
  };

  for (const Event& ev : events) {
    if (ev.tick) advance_to(cur_tick + ev.tick);
    if (!bounded) return false;
    if (ev.status == 0xFF && ev.meta_type == 0x2F) break;
    uint8_t hi = ev.status >> 4;
    if (hi == 0x9 || hi == 0x8) {
      int pitch = ev.d0 & 0x7F;
      double value = (hi == 0x9) ? ev.d1 / 127.0 : 0.0;
      if (value > 0.0 && cur_tick % step != 0 && prev[pitch] > 0.0) {
        // Replay: keep the previous volume (boundary ticks suppressed —
        // ref: midi_util.py:136-151 buffer-reset quirk).
        win_replay[pitch] = 1;
        value = prev[pitch];
      }
      cur[pitch] = value;
      if (cur_tick % step == 0) start_snap[pitch] = cur[pitch];
    }
    // All other events only advance time.
  }

  // Tail frame: volume = state at the window's first tick (NOT the max),
  // replay = any over the leftover window (ref: midi_util.py:157-160).
  size_t base = volume->size();
  volume->resize(base + kClasses);
  replay->resize(base + kClasses);
  for (int c = 0; c < kClasses; ++c) {
    (*volume)[base + c] = start_snap[c];
    (*replay)[base + c] = win_replay[c] ? 1.0 : 0.0;
  }
  return true;
}

}  // namespace

static int dj_decode_buffer_impl(const uint8_t* data, uint64_t size,
                                 int notes_per_beat, int step_override,
                                 double** out, int64_t* out_frames) {
  Reader r{data, data + size};
  if (r.u32() != 0x4D546864u) return 1;  // "MThd"
  uint32_t hdr_len = r.u32();
  r.u16();  // format
  uint32_t ntracks = r.u16();
  uint32_t division = r.u16();
  if (hdr_len > 6) r.skip(hdr_len - 6);
  if (!r.ok || (division & 0x8000)) return 2;

  int step = step_override > 0
                 ? step_override
                 : (int)division / (notes_per_beat > 0 ? notes_per_beat : 4);
  // Sub-notes_per_beat resolutions are a contract violation: fail the
  // decode (the Python codec raises ValueError for the same input —
  // tests/test_native_codec.py pins the parity) instead of silently
  // decoding at a different time grid than the reference would.
  if (step <= 0) return 3;

  std::vector<double> merged_vol, merged_rep;
  bool have = false;

  for (uint32_t t = 0; t < ntracks; ++t) {
    uint32_t magic = r.u32();
    uint32_t len = r.u32();
    if (!r.ok) break;
    const uint8_t* body = r.p;
    // A malformed length field can exceed the remaining buffer; parsing a
    // track body past `r.end` would be an out-of-bounds read.  Bail hard —
    // the Python caller surfaces this as a parse error and dataset.py's
    // safe_load skips the file.
    if ((uint64_t)(r.end - body) < (uint64_t)len) return 3;
    r.skip(len);
    if (!r.ok) return 3;
    if (magic != 0x4D54726Bu) continue;  // "MTrk"

    std::vector<Event> events;
    if (!parse_track(Reader{body, body + len}, &events)) return 3;

    std::vector<double> vol, rep;
    if (!decode_track(events, step, &vol, &rep)) return 3;

    if (!have) {
      merged_vol = std::move(vol);
      merged_rep = std::move(rep);
      have = true;
    } else {
      // Additive merge, shorter zero-padded (ref: midi_util.py:170-186).
      if (vol.size() > merged_vol.size()) {
        std::swap(vol, merged_vol);
        std::swap(rep, merged_rep);
      }
      for (size_t idx = 0; idx < vol.size(); ++idx) {
        merged_vol[idx] += vol[idx];
        merged_rep[idx] += rep[idx];
      }
    }
  }

  if (!have) {
    *out = nullptr;
    *out_frames = 0;
    return 0;
  }

  int64_t frames = (int64_t)(merged_vol.size() / kClasses);
  double* roll = (double*)malloc(sizeof(double) * frames * kClasses * 3);
  if (!roll) return 4;
  for (int64_t fr = 0; fr < frames; ++fr) {
    for (int c = 0; c < kClasses; ++c) {
      double vv = merged_vol[fr * kClasses + c];
      double rr = merged_rep[fr * kClasses + c];
      double play = std::ceil(vv);
      // Clamp stacked duplicates to one (ref: midi_util.py:188-190).
      roll[(fr * kClasses + c) * 3 + 0] = std::min(play, 1.0);
      roll[(fr * kClasses + c) * 3 + 1] = std::min(rr, 1.0);
      roll[(fr * kClasses + c) * 3 + 2] = std::min(vv, 1.0);
    }
  }
  *out = roll;
  *out_frames = frames;
  return 0;
}

extern "C" {

// Decode a .mid file already loaded into memory.
// On success returns 0 and sets *out (malloc'd [T, 128, 3] float64,
// channels: play, replay, volume) and *out_frames = T.
// Caller frees with dj_free.  Returns nonzero on parse failure.
int dj_decode_buffer(const uint8_t* data, uint64_t size, int notes_per_beat,
                     int step_override, double** out, int64_t* out_frames) {
  // No C++ exception may unwind through the extern "C"/ctypes boundary
  // (std::terminate would abort the whole training process) — convert
  // anything thrown (e.g. bad_alloc from a vector resize) to an error code
  // that the Python caller surfaces as a per-file parse failure.
  try {
    return dj_decode_buffer_impl(data, size, notes_per_beat, step_override,
                                 out, out_frames);
  } catch (...) {
    return 5;
  }
}

int dj_decode_file(const char* path, int notes_per_beat, int step_override,
                   double** out, int64_t* out_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return 10;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)size);
  size_t got = fread(buf.data(), 1, (size_t)size, f);
  fclose(f);
  if ((long)got != size) return 11;
  return dj_decode_buffer(buf.data(), (uint64_t)size, notes_per_beat,
                          step_override, out, out_frames);
}

void dj_free(double* ptr) { free(ptr); }

int dj_abi_version() { return 1; }

}  // extern "C"
