// Native host-DRAM staging ops for cachedembedding_tpu.
//
// The TPU-native replacement for the host side of the reference cache's
// CUDA index_select/index_copy_ row staging (SURVEY.md §2.3): multithreaded
// row gather/scatter over a giant (up to ~90 GB) embedding table in TPU-VM
// host DRAM, plus table init and the id-frequency bincount pass.
//
// Build: make -C cachedembedding_tpu/_native   (produces libhostops.so)
// Loaded via ctypes from hostops.py; numpy fallback when absent.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

#include <sys/mman.h>

namespace {

inline unsigned n_workers(int64_t items, int64_t min_per_thread) {
  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 1;
  int64_t want = items / min_per_thread;
  if (want < 1) want = 1;
  return static_cast<unsigned>(want < hw ? want : hw);
}

template <typename Fn>
void parallel_for(int64_t n, int64_t min_per_thread, Fn fn) {
  unsigned workers = n_workers(n, min_per_thread);
  if (workers <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(workers);
  int64_t chunk = (n + workers - 1) / workers;
  for (unsigned w = 0; w < workers; ++w) {
    int64_t lo = static_cast<int64_t>(w) * chunk;
    int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    threads.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

// out[i, :] = table[idx[i], :]
// Random-access rows from a huge table are DRAM-latency bound; software
// prefetch of rows a few iterations ahead hides most of it.
void gather_rows_f32(const float* table, const int64_t* idx, float* out,
                     int64_t n, int64_t dim, int64_t num_rows) {
  const size_t row_bytes = static_cast<size_t>(dim) * sizeof(float);
  constexpr int64_t kAhead = 8;
  parallel_for(n, 4096, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      if (i + kAhead < hi) {
        int64_t pr = idx[i + kAhead];
        if (pr >= 0 && pr < num_rows) {
          const char* p = reinterpret_cast<const char*>(table + pr * dim);
          for (size_t b = 0; b < row_bytes; b += 64) __builtin_prefetch(p + b, 0, 0);
        }
      }
      int64_t r = idx[i];
      if (r < 0 || r >= num_rows) r = 0;  // defensive clamp (padded entries)
      std::memcpy(out + i * dim, table + r * dim, row_bytes);
    }
  });
}

// table[idx[i], :] = values[i, :]
void scatter_rows_f32(float* table, const int64_t* idx, const float* values,
                      int64_t n, int64_t dim, int64_t num_rows) {
  const size_t row_bytes = static_cast<size_t>(dim) * sizeof(float);
  // NOTE: duplicate idx entries race under threads; the cache manager never
  // passes duplicates (victim slots / evicted rows are unique per plan).
  parallel_for(n, 4096, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t r = idx[i];
      if (r < 0 || r >= num_rows) continue;
      std::memcpy(table + r * dim, values + i * dim, row_bytes);
    }
  });
}

// U(low, high) fill for multi-GB table init. xoshiro-style generator: table
// init only needs decorrelated values, not crypto quality, and mt19937 is ~10x
// slower, which matters at 90 GB.
void fill_uniform_f32(float* buf, int64_t n, float low, float high, uint64_t seed) {
  const float scale = (high - low) * (1.0f / 16777216.0f);  // 2^-24
  parallel_for(n, 1 << 20, [=](int64_t lo, int64_t hi) {
    uint64_t s = seed ^ (0x9e3779b97f4a7c15ULL * static_cast<uint64_t>(lo + 1));
    // splitmix64 warmup to decorrelate nearby chunk seeds
    auto next = [&s]() {
      s ^= s << 13;
      s ^= s >> 7;
      s ^= s << 17;
      return s;
    };
    for (int k = 0; k < 4; ++k) next();
    for (int64_t i = lo; i < hi; ++i) {
      buf[i] = low + static_cast<float>(next() >> 40) * scale;
    }
  });
}

// Anonymous mmap with MADV_HUGEPAGE: first-touch page faults dominate init of
// multi-GB host tables on 4 KB pages (~0.15 GB/s measured on TPU-VM); 2 MB THP
// cuts fault count 512x. Returns NULL on failure (caller falls back to numpy).
void* alloc_hugepage(uint64_t bytes) {
  void* p = mmap(nullptr, bytes, PROT_READ | PROT_WRITE,
                 MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
  if (p == MAP_FAILED) return nullptr;
  madvise(p, bytes, MADV_HUGEPAGE);
  return p;
}

void free_hugepage(void* p, uint64_t bytes) { munmap(p, bytes); }

// Bit-pack non-negative int32 ids into a dense u8 stream for the host->device
// input transfer (slot ids are < cache capacity, typically 19-21 bits, so
// int32 wastes ~40% of the dominant transfer). width_bits in {16, 20, 24}:
//   16 -> 2 bytes/id; 24 -> 3 bytes/id; 20 -> ids packed in PAIRS of 5 bytes
//   (n must be even). Decode is a handful of vector shifts on device.
void pack_ids_u8(const int32_t* ids, int64_t n, int64_t width_bits, uint8_t* out) {
  if (width_bits == 16) {
    parallel_for(n, 1 << 18, [=](int64_t lo, int64_t hi) {
      for (int64_t i = lo; i < hi; ++i) {
        const uint32_t v = static_cast<uint32_t>(ids[i]);
        out[2 * i] = v & 0xFF;
        out[2 * i + 1] = (v >> 8) & 0xFF;
      }
    });
  } else if (width_bits == 24) {
    parallel_for(n, 1 << 18, [=](int64_t lo, int64_t hi) {
      for (int64_t i = lo; i < hi; ++i) {
        const uint32_t v = static_cast<uint32_t>(ids[i]);
        out[3 * i] = v & 0xFF;
        out[3 * i + 1] = (v >> 8) & 0xFF;
        out[3 * i + 2] = (v >> 16) & 0xFF;
      }
    });
  } else {  // 20-bit pairs
    const int64_t pairs = n / 2;
    parallel_for(pairs, 1 << 17, [=](int64_t lo, int64_t hi) {
      for (int64_t p = lo; p < hi; ++p) {
        const uint32_t a = static_cast<uint32_t>(ids[2 * p]);
        const uint32_t b = static_cast<uint32_t>(ids[2 * p + 1]);
        out[5 * p] = a & 0xFF;
        out[5 * p + 1] = (a >> 8) & 0xFF;
        out[5 * p + 2] = ((a >> 16) & 0xF) | ((b & 0xF) << 4);
        out[5 * p + 3] = (b >> 4) & 0xFF;
        out[5 * p + 4] = (b >> 12) & 0xFF;
      }
    });
  }
}

// Escape-coded pack of a whole uniform window: slot3 is (P, F, Bf) C-order;
// feature f packs at widths[f] bits after subtracting deltas[f]; when
// widths[f] < plain_widths[f] (a narrowed feature), values whose local id
// does not fit are recorded as (flat position, RAW id) escapes and their
// base lanes masked. Output blocks are feature-major at out_offsets[f].
// Escapes are ordered (feature, p, j) — identical to the python encoder.
// Returns the escape count, or -1 when it exceeds max_overflow (caller
// falls back to the plain format). Two passes: count (parallel over
// features), then pack+record at prefix-summed escape offsets.
static inline void pack_pair_le(uint8_t* dst, uint64_t a, uint64_t b, int w) {
  uint64_t combined = a | (b << w);
  const int k = w / 4;  // bytes per pair (2*w bits, w nibble-aligned)
  for (int j = 0; j < k; ++j) dst[j] = (combined >> (8 * j)) & 0xFF;
}

int64_t escape_pack_window_i32(
    const int32_t* slot3, int64_t P, int64_t F, int64_t Bf,
    const int32_t* widths, const int32_t* plain_widths, const int32_t* deltas,
    const int64_t* out_offsets, uint8_t* out,
    uint32_t* opos, int32_t* oval, int64_t max_overflow) {
  const int64_t L = F * Bf;
  std::vector<int64_t> counts(F, 0);
  // pass 1: per-feature escape counts (narrowed features only)
  parallel_for(F, 1, [&](int64_t flo, int64_t fhi) {
    for (int64_t f = flo; f < fhi; ++f) {
      if (widths[f] >= plain_widths[f]) continue;
      const uint32_t lim = 1u << widths[f];
      const int32_t delta = deltas[f];
      int64_t c = 0;
      for (int64_t p = 0; p < P; ++p) {
        const int32_t* v = slot3 + (p * F + f) * Bf;
        for (int64_t j = 0; j < Bf; ++j)
          c += (static_cast<uint32_t>(v[j] - delta) >= lim);
      }
      counts[f] = c;
    }
  });
  std::vector<int64_t> esc_off(F + 1, 0);
  for (int64_t f = 0; f < F; ++f) esc_off[f + 1] = esc_off[f] + counts[f];
  const int64_t total = esc_off[F];
  if (total > max_overflow) return -1;
  // pass 2: pack every feature block; record escapes at their offsets.
  // Direct (p, j) iteration over the feature's contiguous chunks with a
  // pair-packer carry across chunk boundaries — no per-element div/mod.
  parallel_for(F, 1, [&](int64_t flo, int64_t fhi) {
    for (int64_t f = flo; f < fhi; ++f) {
      const int w = widths[f];
      const bool narrowed = w < plain_widths[f];
      const uint32_t mask = (w >= 32) ? 0xFFFFFFFFu : ((1u << w) - 1);
      const int32_t delta = deltas[f];
      uint8_t* dst = out + out_offsets[f];
      uint32_t* ep = opos + esc_off[f];
      int32_t* ev = oval + esc_off[f];
      uint64_t pending = 0;
      bool has_pending = false;
      for (int64_t p = 0; p < P; ++p) {
        const int32_t* v = slot3 + (p * F + f) * Bf;
        const uint32_t pos0 = static_cast<uint32_t>(p * L + f * Bf);
        if (!narrowed) {
          for (int64_t j = 0; j < Bf; ++j) {
            const uint32_t local = static_cast<uint32_t>(v[j] - delta);
            if (has_pending) {
              pack_pair_le(dst, pending, local, w);
              dst += w / 4;
              has_pending = false;
            } else {
              pending = local;
              has_pending = true;
            }
          }
        } else {
          for (int64_t j = 0; j < Bf; ++j) {
            uint32_t local = static_cast<uint32_t>(v[j] - delta);
            if (local > mask) {
              *ep++ = pos0 + static_cast<uint32_t>(j);
              *ev++ = v[j];  // RAW id
              local &= mask;
            }
            if (has_pending) {
              pack_pair_le(dst, pending, local, w);
              dst += w / 4;
              has_pending = false;
            } else {
              pending = local;
              has_pending = true;
            }
          }
        }
      }
      if (has_pending) {  // odd total: only legal for byte-aligned widths
        for (int j = 0; j < w / 8; ++j) dst[j] = (pending >> (8 * j)) & 0xFF;
      }
    }
  });
  return total;
}

// out[id] += 1 for every id (single-threaded: bincount over int64 ids;
// callers stream shards through this).
void bincount_i32(const int64_t* ids, int64_t* out, int64_t n, int64_t num_rows) {
  for (int64_t i = 0; i < n; ++i) {
    int64_t r = ids[i];
    if (r >= 0 && r < num_rows) ++out[r];
  }
}

// Bin-grouping plan for the Pallas binned MXU scatter-add backward
// (cachedembedding_tpu/ops/binned_scatter.py): stable counting sort of the
// id stream by (id / block_rows) bin. Two linear passes (~1-2 ms at L=426k
// vs ~25 ms for np.argsort). The kernel needs only bin-contiguity, not a
// full sort — within a bin any order is correct (the one-hot handles it).
// Outputs: perm (n), ids_grouped (n), bin_starts (nb+1).
void sort_plan_i32(const int32_t* ids, int64_t n, int64_t num_rows,
                   int64_t block_rows, int32_t* perm, int32_t* ids_grouped,
                   int32_t* bin_starts) {
  const int64_t nb = (num_rows + block_rows - 1) / block_rows;
  std::vector<int64_t> cur(nb + 1, 0);
  for (int64_t i = 0; i < n; ++i) ++cur[ids[i] / block_rows + 1];
  int64_t cum = 0;
  for (int64_t b = 0; b <= nb; ++b) {
    cum += cur[b];
    cur[b] = cum;
    bin_starts[b] = static_cast<int32_t>(cum);
  }
  for (int64_t i = 0; i < n; ++i) {
    const int64_t p = cur[ids[i] / block_rows]++;
    perm[p] = static_cast<int32_t>(i);
    ids_grouped[p] = ids[i];
  }
}

// ---------------------------------------------------------------------------
// Overlay table: a virtual host embedding table. Un-written rows are generated
// procedurally (deterministic per-row RNG, U(-bound, bound) with a per-row
// bound); written rows live in an open-addressing hash table. Host memory cost
// is the touched working set, not num_rows * dim — this is how the framework
// hosts a logical 90+ GB Criteo-1TB table on a modest TPU-VM for capacity
// tests and benchmarks (materialized numpy tables remain the default for real
// datasets).
// ---------------------------------------------------------------------------

// ---------------------------------------------------------------------------
// Canonical procedural row init, shared bit-for-bit with the DEVICE-side
// generator (cachedembedding_tpu/ops/synth_rows.py). Embedding init is a pure
// function of (global row id, column, seed), which means a never-yet-trained
// row never has to cross the host->device link at all — the device can
// materialize it locally ("lazy device init"). Keep the three implementations
// (this one, the overlay's, jnp's) in lockstep: 32-bit ops only.
// ---------------------------------------------------------------------------

namespace {

inline uint32_t mix32(uint32_t x) {
  x ^= x >> 16;
  x *= 0x7feb352dU;
  x ^= x >> 15;
  x *= 0x846ca68bU;
  x ^= x >> 16;
  return x;
}

// out[j] = U(-bound, bound) from hash(row, j, seed); exact f32 parity with the
// device generator (no FMA: value computed as (h>>8)*scale then - bound, both
// emitted as separate ops on either side).
inline void gen_row_canonical(int64_t row_id, uint32_t seed, float bound,
                              float* out, int64_t dim) {
  const uint32_t h0 = mix32(static_cast<uint32_t>(row_id) * 0x9e3779b1U + seed);
  const float scale = 2.0f * bound * (1.0f / 16777216.0f);
  for (int64_t j = 0; j < dim; ++j) {
    const uint32_t h = mix32(h0 ^ (static_cast<uint32_t>(j) * 0x85ebca77U + 1U));
    const float v = static_cast<float>(h >> 8) * scale;
    out[j] = v - bound;
  }
}

}  // namespace

extern "C" {

// Initialize rows [start_row, start_row + n) of a table slab with the
// canonical generator (multithreaded). Used for materialized host tables so
// that dense and virtual tables (and the device) agree on every init value.
void fill_rows_canonical(float* buf, int64_t start_row, int64_t n, int64_t dim,
                         uint32_t seed, float bound) {
  parallel_for(n, 1 << 14, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      gen_row_canonical(start_row + i, seed, bound, buf + i * dim, dim);
    }
  });
}

}  // extern "C"

namespace {

struct Overlay {
  int64_t dim;
  uint64_t seed;
  uint64_t mask;        // slots - 1 (power of two)
  int64_t used;
  std::vector<int64_t> keys;   // -1 = empty
  std::vector<float> rows;     // slots * dim

  explicit Overlay(int64_t d, uint64_t s, uint64_t slots) : dim(d), seed(s) {
    uint64_t cap = 64;
    while (cap < slots) cap <<= 1;
    mask = cap - 1;
    used = 0;
    keys.assign(cap, -1);
    rows.assign(cap * static_cast<uint64_t>(d), 0.f);
  }
};

inline uint64_t mix64(uint64_t x) {
  x ^= x >> 33;
  x *= 0xff51afd7ed558ccdULL;
  x ^= x >> 33;
  x *= 0xc4ceb9fe1a85ec53ULL;
  x ^= x >> 33;
  return x;
}

// find slot for key; returns slot index, or the empty slot where it would go.
inline uint64_t probe(const Overlay& t, int64_t key) {
  uint64_t h = mix64(static_cast<uint64_t>(key) ^ t.seed) & t.mask;
  while (t.keys[h] != -1 && t.keys[h] != key) h = (h + 1) & t.mask;
  return h;
}

void overlay_grow(Overlay& t) {
  Overlay bigger(t.dim, t.seed, (t.mask + 1) * 2);
  for (uint64_t s = 0; s <= t.mask; ++s) {
    if (t.keys[s] == -1) continue;
    uint64_t ns = probe(bigger, t.keys[s]);
    bigger.keys[ns] = t.keys[s];
    std::memcpy(&bigger.rows[ns * t.dim], &t.rows[s * t.dim], t.dim * sizeof(float));
  }
  bigger.used = t.used;
  t = std::move(bigger);
}

}  // namespace

void* overlay_create(int64_t dim, uint64_t seed, int64_t capacity_hint) {
  return new Overlay(dim, seed, static_cast<uint64_t>(capacity_hint * 2));
}

void overlay_free(void* h) { delete static_cast<Overlay*>(h); }

int64_t overlay_used(void* h) { return static_cast<Overlay*>(h)->used; }

// Dump the written row ids (out must have room for overlay_used entries).
void overlay_keys(void* h, int64_t* out) {
  Overlay& t = *static_cast<Overlay*>(h);
  int64_t j = 0;
  for (uint64_t s = 0; s <= t.mask; ++s) {
    if (t.keys[s] != -1) out[j++] = t.keys[s];
  }
}

// out[i] = overlay[ids[i]] if written else procedural(ids[i], bounds[i])
void overlay_gather_f32(void* h, const int64_t* ids, const float* bounds,
                        float* out, int64_t n) {
  Overlay& t = *static_cast<Overlay*>(h);
  for (int64_t i = 0; i < n; ++i) {
    uint64_t s = probe(t, ids[i]);
    if (t.keys[s] == ids[i]) {
      std::memcpy(out + i * t.dim, &t.rows[s * t.dim], t.dim * sizeof(float));
    } else {
      gen_row_canonical(ids[i], static_cast<uint32_t>(t.seed), bounds[i],
                        out + i * t.dim, t.dim);
    }
  }
}

// out[i] = 1 if ids[i] has been written (lives in the overlay), else 0.
void overlay_contains(void* h, const int64_t* ids, uint8_t* out, int64_t n) {
  Overlay& t = *static_cast<Overlay*>(h);
  for (int64_t i = 0; i < n; ++i) {
    out[i] = t.keys[probe(t, ids[i])] == ids[i] ? 1 : 0;
  }
}

void overlay_scatter_f32(void* h, const int64_t* ids, const float* vals, int64_t n) {
  Overlay& t = *static_cast<Overlay*>(h);
  for (int64_t i = 0; i < n; ++i) {
    if (static_cast<uint64_t>(t.used) * 4 >= (t.mask + 1) * 3) overlay_grow(t);
    uint64_t s = probe(t, ids[i]);
    if (t.keys[s] == -1) {
      t.keys[s] = ids[i];
      ++t.used;
    }
    std::memcpy(&t.rows[s * t.dim], vals + i * t.dim, t.dim * sizeof(float));
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Rank-tier window id encoder (trainer._tier_encode steady-state path).
//
// The numpy encoder costs ~220 ms per headline window (np.unique sorts 131k
// values per dict feature) and this host has ONE core, so that would make
// the host the critical path (device budget ~115 ms/window) — which is why
// id_wire="ranktier" could not be the default. This implementation is
// sort-free and stateful:
//   * rank dictionaries persist across windows (rt_state_create) and are
//     REBUILT only every few windows (rebuild=1): the dict ships with every
//     window anyway, so encoding against a slightly stale dict decodes
//     exactly — drift only shifts tier shares, which the caps guard.
//   * the per-window work is ONE merged pass per feature: rank lookup ->
//     tier -> selector byte -> carry-based substream bit-packing, no
//     intermediate arrays.
// Features run in parallel when cores exist (independent output blocks).
//
// Byte layout per feature (must match the numpy encoder in
// train/trainer.py::_tier_encode and the device decode _decode_window_ids):
//   plain entry ("p", w, delta):  n ids packed at w bits (after -delta),
//     overflowing ids (only when w < plain width) masked and recorded as
//     window-level (u32 flat pos, i32 raw id) escapes, ordered (f, p, j).
//   tier entry ("t", (w0..w3), delta, caps, dict_k):
//     [n/4 selector bytes: 4x 2-bit tiers, little-endian]
//     [dict_k x i32 LE rank->value dict, when dict_k > 0]
//     [4 substreams, tier k zero-padded to caps[k] ids packed at wk bits]
// Dict rank ties (equal counts) may order differently from numpy — the
// decode is invariant (dict and symbols ship together).

namespace {

struct RtPacker {  // carry-based nibble-aligned bit packer (pairs for w%8)
  uint8_t* dst;
  int w;
  uint32_t pending;
  bool has_pending;
  int64_t count;
  void init(uint8_t* d, int width) {
    dst = d;
    w = width;
    pending = 0;
    has_pending = false;
    count = 0;
  }
  inline void push(uint32_t v) {
    ++count;
    if (w == 32) {
      std::memcpy(dst, &v, 4);
      dst += 4;
    } else if (w == 8) {
      *dst++ = static_cast<uint8_t>(v);
    } else if (w % 8 == 0) {  // 16 / 24
      for (int j = 0; j < w / 8; ++j) *dst++ = (v >> (8 * j)) & 0xFF;
    } else if (has_pending) {
      pack_pair_le(dst, pending, v, w);
      dst += w / 4;
      has_pending = false;
    } else {
      pending = v;
      has_pending = true;
    }
  }
  // zero-pad to cap elements (same bytes as packing a zero-padded stream)
  void finish(int64_t cap) {
    if (has_pending) {
      pack_pair_le(dst, pending, 0, w);
      dst += w / 4;
      has_pending = false;
      ++count;
    }
    const int64_t rest = cap - count;
    if (rest > 0) {
      const int64_t nb = (rest * w) / 8;
      std::memset(dst, 0, static_cast<size_t>(nb));
      dst += nb;
    }
  }
};

struct RtState {
  int64_t F = 0, max_val = 0;
  std::vector<int32_t> ent_type, deltas, plain_w, dict_ks;  // (F,)
  std::vector<int32_t> widths, caps;                        // (F, 4)
  // dict features only (empty vectors otherwise):
  std::vector<std::vector<int32_t>> rank;   // rank_of[value]; -1 = unranked
  std::vector<std::vector<int32_t>> dictv;  // (dict_k,) current dict
  std::vector<std::vector<int32_t>> uniq;   // values touched at last rebuild
};

}  // namespace

extern "C" {

void* rt_state_create(int64_t F, int64_t max_val, const int32_t* ent_type,
                      const int32_t* widths, const int32_t* deltas,
                      const int32_t* plain_w, const int32_t* caps,
                      const int32_t* dict_ks) {
  auto* st = new RtState();
  st->F = F;
  st->max_val = max_val;
  st->ent_type.assign(ent_type, ent_type + F);
  st->deltas.assign(deltas, deltas + F);
  st->plain_w.assign(plain_w, plain_w + F);
  st->dict_ks.assign(dict_ks, dict_ks + F);
  st->widths.assign(widths, widths + F * 4);
  st->caps.assign(caps, caps + F * 4);
  st->rank.resize(F);
  st->dictv.resize(F);
  st->uniq.resize(F);
  for (int64_t f = 0; f < F; ++f) {
    if (st->ent_type[f] == 1 && st->dict_ks[f] > 0) {
      st->rank[f].assign(static_cast<size_t>(max_val), -1);
      st->dictv[f].assign(static_cast<size_t>(st->dict_ks[f]), 0);
    }
  }
  return st;
}

void rt_state_free(void* h) { delete static_cast<RtState*>(h); }

// Returns the escape count (>= 0) on success, -1 on a tier-cap overflow
// (overflow_info = [f, cnt0..3, cap0..3]; caller ships the plain format),
// -2 when plain-entry escapes exceed max_overflow.
int64_t rt_encode_window(void* h, const int32_t* slot3, int64_t P, int64_t Bf,
                         int32_t rebuild, const int64_t* out_offsets,
                         uint8_t* out, uint32_t* opos, int32_t* oval,
                         int64_t max_overflow, int32_t* overflow_info) {
  RtState& st = *static_cast<RtState*>(h);
  const int64_t F = st.F;
  const int64_t L = F * Bf;
  const int64_t n = P * Bf;
  // pass 1: per-feature escape counts (plain narrowed features only)
  std::vector<int64_t> esc_cnt(F, 0);
  bool any_narrowed = false;
  for (int64_t f = 0; f < F; ++f)
    any_narrowed |= (st.ent_type[f] == 0 && st.widths[f * 4] < st.plain_w[f]);
  if (any_narrowed) {
    parallel_for(F, 1, [&](int64_t flo, int64_t fhi) {
      for (int64_t f = flo; f < fhi; ++f) {
        if (st.ent_type[f] != 0) continue;
        const int w = st.widths[f * 4];
        if (w >= st.plain_w[f]) continue;
        const uint32_t lim = 1u << w;
        const int32_t delta = st.deltas[f];
        int64_t c = 0;
        for (int64_t p = 0; p < P; ++p) {
          const int32_t* v = slot3 + (p * F + f) * Bf;
          for (int64_t j = 0; j < Bf; ++j)
            c += (static_cast<uint32_t>(v[j] - delta) >= lim);
        }
        esc_cnt[f] = c;
      }
    });
  }
  std::vector<int64_t> esc_off(F + 1, 0);
  for (int64_t f = 0; f < F; ++f) esc_off[f + 1] = esc_off[f] + esc_cnt[f];
  if (esc_off[F] > max_overflow) return -2;

  std::atomic<int64_t> failed{-1};
  parallel_for(F, 1, [&](int64_t flo, int64_t fhi) {
    std::vector<int32_t> counts;  // per-worker rebuild scratch
    for (int64_t f = flo; f < fhi; ++f) {
      if (failed.load(std::memory_order_relaxed) >= 0) return;
      uint8_t* dst = out + out_offsets[f];
      const int32_t delta = st.deltas[f];
      if (st.ent_type[f] == 0) {
        // plain entry: pack + record escapes in one pass
        const int w = st.widths[f * 4];
        const bool narrowed = w < st.plain_w[f];
        const uint32_t mask = (w >= 32) ? 0xFFFFFFFFu : ((1u << w) - 1);
        uint32_t* ep = opos + esc_off[f];
        int32_t* ev = oval + esc_off[f];
        RtPacker pk;
        pk.init(dst, w);
        for (int64_t p = 0; p < P; ++p) {
          const int32_t* v = slot3 + (p * F + f) * Bf;
          const uint32_t pos0 = static_cast<uint32_t>(p * L + f * Bf);
          for (int64_t j = 0; j < Bf; ++j) {
            uint32_t local = static_cast<uint32_t>(v[j] - delta);
            if (narrowed && local > mask) {
              *ep++ = pos0 + static_cast<uint32_t>(j);
              *ev++ = v[j];  // RAW id
              local &= mask;
            }
            pk.push(local);
          }
        }
        pk.finish(n);
        continue;
      }
      // tier entry
      const int32_t* W = &st.widths[f * 4];
      const int32_t* C = &st.caps[f * 4];
      const int64_t dict_k = st.dict_ks[f];
      int32_t* rank = dict_k > 0 ? st.rank[f].data() : nullptr;
      if (dict_k > 0 && rebuild) {
        // re-rank this feature from the current window's frequencies
        if (static_cast<int64_t>(counts.size()) < st.max_val)
          counts.assign(static_cast<size_t>(st.max_val), 0);
        std::vector<int32_t>& uq = st.uniq[f];
        // clear the previous ranking
        for (int32_t v : uq) rank[v] = -1;
        uq.clear();
        for (int64_t p = 0; p < P; ++p) {
          const int32_t* v = slot3 + (p * F + f) * Bf;
          for (int64_t j = 0; j < Bf; ++j) {
            if (j + 16 < Bf) __builtin_prefetch(&counts[v[j + 16]], 1, 0);
            if (counts[v[j]]++ == 0) uq.push_back(v[j]);
          }
        }
        const int64_t U = static_cast<int64_t>(uq.size());
        const int64_t k = std::min<int64_t>(dict_k - 1, U);
        if (U > k) {
          std::nth_element(uq.begin(), uq.begin() + k, uq.end(),
                           [&](int32_t a, int32_t b) {
                             return counts[a] > counts[b];
                           });
        }
        std::sort(uq.begin(), uq.begin() + k,
                  [&](int32_t a, int32_t b) { return counts[a] > counts[b]; });
        std::vector<int32_t>& dv = st.dictv[f];
        std::fill(dv.begin(), dv.end(), 0);
        for (int64_t r = 0; r < k; ++r) {
          dv[r] = uq[r];
          rank[uq[r]] = static_cast<int32_t>(r);
        }
        for (int32_t v : uq) counts[v] = 0;  // clean worker scratch
      }
      // merged encode pass: rank -> tier -> selector + substreams
      uint8_t* sel_dst = dst;
      uint8_t* sdst = dst + n / 4;
      if (dict_k > 0) {
        std::memcpy(sdst, st.dictv[f].data(),
                    static_cast<size_t>(dict_k) * 4);
        sdst += dict_k * 4;
      }
      RtPacker pk[4];
      for (int t = 0; t < 4; ++t) {
        pk[t].init(sdst, W[t]);
        sdst += (static_cast<int64_t>(C[t]) * W[t]) / 8;
      }
      const uint32_t lim0 = 1u << W[0], lim1 = 1u << W[1], lim2 = 1u << W[2];
      const uint32_t maxv = static_cast<uint32_t>(st.max_val);
      bool over = false;
      int64_t i = 0;
      uint8_t selbyte = 0;
      for (int64_t p = 0; p < P && !over; ++p) {
        const int32_t* v = slot3 + (p * F + f) * Bf;
        for (int64_t j = 0; j < Bf; ++j, ++i) {
          uint32_t t, sym;
          if (dict_k > 0) {
            if (j + 16 < Bf) {  // hide the random rank-lookup DRAM latency
              const uint32_t pv = static_cast<uint32_t>(v[j + 16]);
              if (pv < maxv) __builtin_prefetch(&rank[pv], 0, 0);
            }
            const uint32_t uv = static_cast<uint32_t>(v[j]);
            const int32_t r = uv < maxv ? rank[uv] : -1;
            if (r < 0) {
              t = 3;
              sym = static_cast<uint32_t>(v[j] - delta);
            } else {
              const uint32_t ur = static_cast<uint32_t>(r);
              t = ur < lim0 ? 0 : (ur < lim1 ? 1 : 2);
              sym = ur;
            }
          } else {
            sym = static_cast<uint32_t>(v[j] - delta);
            t = sym < lim0 ? 0 : (sym < lim1 ? 1 : (sym < lim2 ? 2 : 3));
          }
          selbyte |= static_cast<uint8_t>(t) << (2 * (i & 3));
          if ((i & 3) == 3) {
            sel_dst[i >> 2] = selbyte;
            selbyte = 0;
          }
          RtPacker& q = pk[t];
          if (q.count >= C[t]) {  // cap overflow: distribution drifted
            over = true;
            break;
          }
          q.push(sym);
        }
      }
      if (over) {
        int64_t expect = -1;
        if (failed.compare_exchange_strong(expect, f)) {
          overflow_info[0] = static_cast<int32_t>(f);
          for (int t = 0; t < 4; ++t) {
            overflow_info[1 + t] = static_cast<int32_t>(pk[t].count);
            overflow_info[5 + t] = C[t];
          }
        }
        return;
      }
      for (int t = 0; t < 4; ++t) pk[t].finish(C[t]);
    }
  });
  if (failed.load() >= 0) return -1;
  return esc_off[F];
}

}  // extern "C"
