// dca_native: host-side search runtime for deepcubea_tpu.
//
// TPU-native counterpart of the reference's C++ sidecar
// (cpp/parallel_weighted_astar.cpp): the host engine owns the open list
// (binary heap), the byte-exact closed set (open-addressing table over
// 64-bit state hashes with full-state verification), the node pool and path
// reconstruction, while the accelerator evaluates the heuristic in large
// batches. Where the reference marshals every child through a Unix socket
// to per-GPU server processes (cpp:121-136, 236-237, 271-289), this engine
// exchanges flat arrays with Python via ctypes — zero serialization.
//
// It doubles as (a) a CPU-only fallback solver and (b) a byte-exact oracle
// for cross-checking the device engine's fingerprint-based dedup.
//
// Parallelism: OpenMP over hashing, dedup probing and cost computation,
// like the reference's expansion/cost loops (cpp:217, 295).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double kInf = std::numeric_limits<double>::infinity();
constexpr int64_t kEmpty = -1;

// 64-bit mix (splitmix64 finalizer) over state bytes.
static inline uint64_t hash_bytes(const uint8_t* p, int n) {
  uint64_t h = 0x9E3779B97F4A7C15ull;
  for (int i = 0; i < n; ++i) {
    h ^= (uint64_t)p[i];
    h *= 0xBF58476D1CE4E5B9ull;
    h ^= h >> 27;
  }
  h ^= h >> 31;
  h *= 0x94D049BB133111EBull;
  h ^= h >> 33;
  return h;
}

struct HeapItem {
  double f;
  int64_t id;
  bool operator<(const HeapItem& o) const { return f > o.f; }  // min-heap
};

struct Search {
  int width = 0;
  double weight = 1.0;
  // node pool (struct-of-arrays)
  std::vector<uint8_t> states;   // pool_size * width
  std::vector<int32_t> g;
  std::vector<int64_t> parent;
  std::vector<int32_t> action;
  // open list
  std::priority_queue<HeapItem> open;
  // closed set: slot -> node id (kEmpty if free); g lives in the pool
  std::vector<int64_t> table;
  uint64_t table_mask = 0;
  // goal tracking
  int64_t goal_id = -1;
  double goal_f = kInf;
  double last_min_pop_f = kInf;
  uint64_t num_generated = 0;

  int64_t alloc(const uint8_t* s, int32_t gg, int64_t par, int32_t act) {
    int64_t id = (int64_t)g.size();
    states.insert(states.end(), s, s + width);
    g.push_back(gg);
    parent.push_back(par);
    action.push_back(act);
    return id;
  }

  const uint8_t* state_of(int64_t id) const { return states.data() + id * width; }

  // probe for the slot holding a byte-equal state (or the first free slot).
  // returns slot index; *found set if occupied by an equal state.
  uint64_t probe(const uint8_t* s, uint64_t h, bool* found) const {
    uint64_t slot = h & table_mask;
    uint64_t step = (h >> 32) | 1;
    for (;;) {
      int64_t occ = table[slot];
      if (occ == kEmpty) { *found = false; return slot; }
      if (std::memcmp(state_of(occ), s, width) == 0) { *found = true; return slot; }
      slot = (slot + step) & table_mask;
    }
  }
};

}  // namespace

extern "C" {

void* dca_search_new(int state_width, uint64_t table_capacity, double weight) {
  // round table up to a power of two
  uint64_t cap = 1;
  while (cap < table_capacity) cap <<= 1;
  auto* s = new Search();
  s->width = state_width;
  s->weight = weight;
  s->table.assign(cap, kEmpty);
  s->table_mask = cap - 1;
  return s;
}

void dca_search_free(void* hs) { delete (Search*)hs; }

void dca_push_root(void* hs, const uint8_t* state, int solved) {
  auto* s = (Search*)hs;
  int64_t id = s->alloc(state, 0, -1, -1);
  bool found;
  uint64_t slot = s->probe(state, hash_bytes(state, s->width), &found);
  if (!found) s->table[slot] = id;
  if (solved) { s->goal_id = id; s->goal_f = 0.0; }
  else s->open.push({0.0, id});
}

// Pop up to max_nodes best open nodes; skips stale entries (a cheaper copy
// of the state was already recorded). Returns count; fills states/g/ids.
int64_t dca_pop(void* hs, int64_t max_nodes, uint8_t* states_out,
                int32_t* g_out, int64_t* ids_out) {
  auto* s = (Search*)hs;
  int64_t n = 0;
  s->last_min_pop_f = kInf;
  while (n < max_nodes && !s->open.empty()) {
    HeapItem it = s->open.top();
    s->open.pop();
    // stale check: if the closed set knows a cheaper g for this state,
    // a better duplicate superseded this entry (reference reopen semantics,
    // astar.py:78-90)
    bool found;
    uint64_t slot = s->probe(s->state_of(it.id),
                             hash_bytes(s->state_of(it.id), s->width), &found);
    if (found) {
      int64_t best = s->table[slot];
      if (s->g[best] < s->g[it.id]) continue;  // stale
    }
    if (it.f < s->last_min_pop_f) s->last_min_pop_f = it.f;
    std::memcpy(states_out + n * s->width, s->state_of(it.id), s->width);
    g_out[n] = s->g[it.id];
    ids_out[n] = it.id;
    ++n;
  }
  return n;
}

// Push n children. parent_ids/actions identify provenance; h/solved come
// from the device heuristic. Dedup is byte-exact with reopen-if-cheaper.
void dca_push_children(void* hs, int64_t n, const int64_t* parent_ids,
                       const int32_t* actions, const uint8_t* child_states,
                       const int32_t* child_g, const float* h,
                       const uint8_t* solved) {
  auto* s = (Search*)hs;
  std::vector<uint64_t> hashes(n);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i)
    hashes[i] = hash_bytes(child_states + i * s->width, s->width);

  s->num_generated += (uint64_t)n;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* cs = child_states + i * s->width;
    bool found;
    uint64_t slot = s->probe(cs, hashes[i], &found);
    if (found) {
      int64_t occ = s->table[slot];
      if (child_g[i] >= s->g[occ]) continue;  // not cheaper: drop
    }
    int64_t id = s->alloc(cs, child_g[i], parent_ids[i], actions[i]);
    s->table[slot] = id;
    double hh = h[i] < 0 ? 0.0 : (double)h[i];  // clip_zero serving
    double f = s->weight * (double)child_g[i] + (solved[i] ? 0.0 : hh);
    if (solved[i]) {
      if (f < s->goal_f) { s->goal_f = f; s->goal_id = id; }
    } else {
      s->open.push({f, id});
    }
  }
}

double dca_goal_f(void* hs) { return ((Search*)hs)->goal_f; }
int64_t dca_goal_id(void* hs) { return ((Search*)hs)->goal_id; }
double dca_min_pop_f(void* hs) { return ((Search*)hs)->last_min_pop_f; }
double dca_min_open_f(void* hs) {
  auto* s = (Search*)hs;
  return s->open.empty() ? kInf : s->open.top().f;
}
uint64_t dca_num_generated(void* hs) { return ((Search*)hs)->num_generated; }
uint64_t dca_num_nodes(void* hs) { return ((Search*)hs)->g.size(); }
int64_t dca_open_size(void* hs) { return (int64_t)((Search*)hs)->open.size(); }

// Walk parent pointers from `id`; writes actions goal->root. Returns length.
int64_t dca_extract_path(void* hs, int64_t id, int32_t* actions_out,
                         int64_t max_len) {
  auto* s = (Search*)hs;
  int64_t n = 0;
  while (id >= 0 && s->action[id] >= 0 && n < max_len) {
    actions_out[n++] = s->action[id];
    id = s->parent[id];
  }
  return n;
}

int dca_omp_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
