// Native grouped-COO layout builder.
//
// Host-side construction of the sub-vreg gather kernel's layout
// (dream_gnn_tpu/graph/grouped.py): edges stable-sorted by
// (dst_tile, src_subtile), split into groups of <= SUB edges confined
// to a `window`-sub-tile source window inside one `span`-sub-tile
// superblock (and one dst tile), groups batched GROUPS_PER_CHUNK per
// chunk per dst tile (every dst tile gets at least one chunk — the
// kernel zeroes each output block on first visit).  Also emits the
// kernel's panel-DMA schedule, compressed to fit the TPU's ~1 MB
// SMEM: per group slot one packed int32
//   (trans_id << (p0_bits + window)) | (p0 << window) | touch_mask
// (INT32_MIN for padding groups), where p0 is the group's base
// sub-tile clamped to span - window, plus the superblock id per panel
// transition (padded with `lead` trailing -1s).  The kernel derives
// ring slots, waits, and lead-ahead DMA starts from the trans_id
// stream.
//
// The NumPy path costs ~16 s at 10M edges (lexsort + a Python loop
// over ~150k groups); this C++ core does one std::sort plus linear
// passes (~1 s).  Output contract is bit-identical to the NumPy
// builder (pinned by tests/test_native_builder.py).
//
// C ABI (ctypes, dream_gnn_tpu/graph/native.py) — gb3 = the
// windowed-meta layout (gb2 was the round-2 span-only packing; the
// loader falls back to NumPy on a stale .so missing the symbol):
//   void*  gb3_plan(src, dst, val, n_edges, n_src, n_dst,
//                   sub, tile_dst, groups_per_chunk, span, window,
//                   lead)
//   int64  gb3_num_chunks(handle)
//   int64  gb3_num_live(handle)
//   int64  gb3_num_trans(handle)   // panel transitions
//   void   gb3_fill(handle, g_src, g_dst, g_val, g_eid,
//                   g_meta, trans_sb, c_dt, c_first)
//   void   gb3_free(handle)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct GPlan {
  // live edges in (dst_tile, src_subtile, input-order) order
  std::vector<int32_t> src, dst, eid;
  std::vector<float> val;
  // groups: [start, end) edge ranges + superblock; chunks: group ranges
  std::vector<int64_t> g_start, g_end;
  std::vector<int32_t> g_sb;
  std::vector<int64_t> c_gstart, c_gend;  // group-index ranges per chunk
  std::vector<int32_t> c_dt;
  int sub = 0, tile_dst = 0, gpc = 0, span = 1, window = 1, lead = 2;
  int64_t n_live = 0;
  int64_t n_trans = -1;  // computed lazily in gb3_num_trans
};

int p0_bits_for(int span) {
  int b = 0;
  for (int v = span - 1; v > 0; v >>= 1) ++b;
  return b;
}

}  // namespace

extern "C" {

void* gb3_plan(const int32_t* src, const int32_t* dst, const float* val,
               int64_t n_edges, int64_t n_src, int64_t n_dst,
               int sub, int tile_dst, int groups_per_chunk, int span,
               int window, int lead) {
  (void)n_src;
  auto* p = new GPlan;
  p->sub = sub;
  p->tile_dst = tile_dst;
  p->gpc = groups_per_chunk;
  p->span = span;
  p->window = window < span ? window : span;
  p->lead = lead;

  // Live edges keep their compacted input index (the physical edge id
  // shared between the fwd and transposed layouts).  Sort (key, edge)
  // pairs by value — contiguous 16-byte records sort ~2x faster than
  // an index sort whose comparator chases src/dst random-access.
  struct Rec {
    int64_t key;   // (dst_tile << 32) | src_subtile
    int64_t edge;  // input index (tie-break == lexsort stability)
    bool operator<(const Rec& o) const {
      return key != o.key ? key < o.key : edge < o.edge;
    }
  };
  std::vector<Rec> recs;
  recs.reserve(n_edges);
  std::vector<int32_t> live_id(n_edges);
  int64_t n_live = 0;
  for (int64_t e = 0; e < n_edges; ++e) {
    if (val[e] != 0.0f) {
      live_id[e] = (int32_t)n_live++;
      recs.push_back(Rec{
          ((int64_t)(dst[e] / tile_dst) << 32) | (uint32_t)(src[e] / sub),
          e});
    }
  }
  p->n_live = n_live;
  std::sort(recs.begin(), recs.end());

  const int64_t n = (int64_t)recs.size();
  p->src.resize(n);
  p->dst.resize(n);
  p->val.resize(n);
  p->eid.resize(n);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t e = recs[i].edge;
    p->src[i] = src[e];
    p->dst[i] = dst[e];
    p->val[i] = val[e];
    p->eid[i] = live_id[e];
  }

  // Groups: a new group at every (dt, superblock) change, every `sub`
  // edges within a block, and whenever the (sorted, hence consecutive)
  // sub-tile range of the run would exceed `window`.
  int64_t prev_key = -1;
  int64_t in_group = 0;
  int32_t group_first_st = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int32_t st = p->src[i] / sub;
    const int64_t key = ((int64_t)(p->dst[i] / tile_dst) << 32) |
                        (uint32_t)(st / span);
    if (key != prev_key || in_group == sub ||
        st - group_first_st >= p->window) {
      if (!p->g_start.empty()) p->g_end.push_back(i);
      p->g_start.push_back(i);
      p->g_sb.push_back(st / span);
      prev_key = key;
      in_group = 0;
      group_first_st = st;
    }
    ++in_group;
  }
  if (!p->g_start.empty()) p->g_end.push_back(n);

  // Chunks: per dst tile in order (empty tiles get one empty chunk),
  // GROUPS_PER_CHUNK groups each.  Groups are already in dt order.
  const int64_t n_tiles = tile_dst > 0 ? (n_dst + tile_dst - 1) / tile_dst
                                       : 1;
  const int64_t n_groups = (int64_t)p->g_start.size();
  int64_t gi = 0;
  for (int64_t t = 0; t < n_tiles; ++t) {
    int64_t g0 = gi;
    while (gi < n_groups &&
           p->dst[p->g_start[gi]] / tile_dst == (int32_t)t)
      ++gi;
    if (g0 == gi) {  // empty tile
      p->c_gstart.push_back(g0);
      p->c_gend.push_back(g0);
      p->c_dt.push_back((int32_t)t);
      continue;
    }
    for (int64_t off = g0; off < gi; off += groups_per_chunk) {
      p->c_gstart.push_back(off);
      p->c_gend.push_back(std::min(off + groups_per_chunk, gi));
      p->c_dt.push_back((int32_t)t);
    }
  }
  return p;
}

int64_t gb3_num_chunks(void* handle) {
  return (int64_t)((GPlan*)handle)->c_gstart.size();
}

int64_t gb3_num_live(void* handle) { return ((GPlan*)handle)->n_live; }

namespace {

// Panel transitions = maximal runs of equal (dst_tile, superblock)
// over live groups in (chunk, slot) stream order.
int64_t count_trans(GPlan* p) {
  int64_t n_trans = 0;
  int64_t prev = -1;
  const int64_t c = (int64_t)p->c_gstart.size();
  for (int64_t ci = 0; ci < c; ++ci) {
    for (int64_t g = p->c_gstart[ci]; g < p->c_gend[ci]; ++g) {
      const int64_t key =
          ((int64_t)p->c_dt[ci] << 32) | (uint32_t)p->g_sb[g];
      if (n_trans == 0 || key != prev) ++n_trans;
      prev = key;
    }
  }
  return n_trans;
}

}  // namespace

int64_t gb3_num_trans(void* handle) {
  auto* p = (GPlan*)handle;
  if (p->n_trans < 0) p->n_trans = count_trans(p);
  return p->n_trans;
}

void gb3_fill(void* handle, int32_t* g_src, int32_t* g_dst, float* g_val,
              int32_t* g_eid, int32_t* g_meta, int32_t* trans_sb,
              int32_t* c_dt, int32_t* c_first) {
  auto* p = (GPlan*)handle;
  const int64_t c = (int64_t)p->c_gstart.size();
  const int sub = p->sub, gpc = p->gpc, span = p->span;
  const int window = p->window;
  const int shift = p0_bits_for(span) + window;
  const int span_sub = sub * span;
  const int64_t slots = (int64_t)gpc * sub;
  const int64_t n_gslots = c * gpc;
  const int32_t pad_meta = INT32_MIN;
  std::memset(g_src, 0, sizeof(int32_t) * c * slots);
  std::memset(g_dst, 0, sizeof(int32_t) * c * slots);
  std::memset(g_val, 0, sizeof(float) * c * slots);
  for (int64_t i = 0; i < n_gslots; ++i) g_meta[i] = pad_meta;
  // Padding slots carry the sentinel edge id n_live.
  for (int64_t i = 0; i < c * slots; ++i) g_eid[i] = (int32_t)p->n_live;

  int64_t n_trans = 0;
  int64_t prev = -1;
  for (int64_t ci = 0; ci < c; ++ci) {
    c_dt[ci] = p->c_dt[ci];
    c_first[ci] = (ci == 0 || p->c_dt[ci] != p->c_dt[ci - 1]) ? 1 : 0;
    for (int64_t g = p->c_gstart[ci]; g < p->c_gend[ci]; ++g) {
      const int64_t gj = g - p->c_gstart[ci];
      const int64_t pos = ci * gpc + gj;
      const int32_t sb = p->g_sb[g];
      const int64_t key = ((int64_t)p->c_dt[ci] << 32) | (uint32_t)sb;
      if (n_trans == 0 || key != prev) {
        trans_sb[n_trans] = sb;
        ++n_trans;
      }
      prev = key;
      const int64_t a = p->g_start[g], b = p->g_end[g];
      // Base sub-tile, clamped so [p0, p0 + window) stays inside the
      // span-panel even for groups near the superblock tail.
      int32_t p0 = p->src[a] / sub - sb * span;
      if (p0 > span - window) p0 = span - window;
      int32_t touch = 0;
      for (int64_t e = a; e < b; ++e) {
        const int64_t slot = ci * slots + gj * sub + (e - a);
        g_src[slot] = p->src[e] % span_sub;
        g_dst[slot] = p->dst[e] % p->tile_dst;
        g_val[slot] = p->val[e];
        g_eid[slot] = p->eid[e];
        touch |= 1 << (p->src[e] / sub - (int64_t)sb * span - p0);
      }
      g_meta[pos] = (int32_t)((((n_trans - 1) << shift) |
                               ((int64_t)p0 << window)) |
                              touch);
    }
  }
  for (int k = 0; k < p->lead; ++k) trans_sb[n_trans + k] = -1;
}

void gb3_free(void* handle) { delete (GPlan*)handle; }

}  // extern "C"
