// Host-side graph/correspondence runtime for particlesfm_tpu.
//
// TPU-native counterpart of the reference's C++ host components: the
// correspondence graph walks (sfm/gmapper/src/base/correspondence_graph.cc),
// MST rotation initialization (global/orientation_util.cc:102-178) and the
// greedy MFAS ordering of the 1DSfM filter (global/filter_util.cc:131-180).
// The device math lives in JAX; these are the irregular pointer-chasing loops
// that stay on host, where C++ beats the Python fallbacks by 1-2 orders of
// magnitude on large scenes (100k tracks, 10k-edge view graphs).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).
// Build: g++ -O3 -march=native -shared -fPIC hostops.cc -o libparticlesfm_host.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;
  explicit UnionFind(int32_t n) : parent(n) {
    std::iota(parent.begin(), parent.end(), 0);
  }
  int32_t find(int32_t x) {
    int32_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int32_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }
  bool unite(int32_t a, int32_t b) {
    int32_t ra = find(a), rb = find(b);
    if (ra == rb) return false;
    parent[rb] = ra;
    return true;
  }
};

}  // namespace

extern "C" {

// Connected components: labels[i] = root id of node i.
void psfm_connected_components(int32_t num_nodes, int64_t num_edges,
                               const int32_t* edges /* [E,2] */,
                               int32_t* labels /* [V] out */) {
  UnionFind uf(num_nodes);
  for (int64_t e = 0; e < num_edges; ++e) uf.unite(edges[2 * e], edges[2 * e + 1]);
  for (int32_t i = 0; i < num_nodes; ++i) labels[i] = uf.find(i);
}

// Maximum spanning forest (Kruskal). Returns number of chosen edges; their
// indices (into the input edge list) are written to chosen.
int64_t psfm_maximum_spanning_tree(int32_t num_nodes, int64_t num_edges,
                                   const int32_t* edges, const double* weights,
                                   int64_t* chosen /* [<=V-1] out */) {
  std::vector<int64_t> order(num_edges);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return weights[a] > weights[b]; });
  UnionFind uf(num_nodes);
  int64_t k = 0;
  for (int64_t idx : order) {
    if (uf.unite(edges[2 * idx], edges[2 * idx + 1])) chosen[k++] = idx;
  }
  return k;
}

// Greedy minimum-feedback-arc-set ordering (1DSfM). proj[e] is the signed
// projection of edge e's direction; the edge is directed i->j when proj > 0.
// order[v] = rank of node v (filter_util.cc FindNextViewInOrder semantics:
// prefer sources, else max (out_w+1)/(in_w+1)).
void psfm_mfas_order(int32_t num_nodes, int64_t num_edges, const int32_t* edges,
                     const double* proj, int32_t* order /* [V] out */) {
  std::vector<double> inw(num_nodes, 0.0), outw(num_nodes, 0.0);
  std::vector<int32_t> indeg(num_nodes, 0);
  // adjacency in CSR-ish form
  std::vector<std::vector<std::pair<int32_t, double>>> innb(num_nodes),
      outnb(num_nodes);
  std::vector<uint8_t> present(num_nodes, 0);
  for (int64_t e = 0; e < num_edges; ++e) {
    int32_t a = edges[2 * e], b = edges[2 * e + 1];
    double w = proj[e];
    if (w <= 0) {
      std::swap(a, b);
      w = -w;
    }
    inw[b] += w;
    outw[a] += w;
    indeg[b] += 1;
    innb[b].push_back({a, w});
    outnb[a].push_back({b, w});
    present[a] = present[b] = 1;
  }
  std::vector<uint8_t> alive = present;
  int32_t remaining = 0;
  for (int32_t v = 0; v < num_nodes; ++v) {
    order[v] = -1;
    if (present[v]) ++remaining;
  }
  for (int32_t rank = 0; remaining > 0; ++rank) {
    int32_t best = -1;
    double best_score = -1.0;
    for (int32_t v = 0; v < num_nodes; ++v) {
      if (!alive[v]) continue;
      if (indeg[v] == 0) {
        best = v;
        break;
      }
      double score = (outw[v] + 1.0) / (inw[v] + 1.0);
      if (score > best_score) {
        best = v;
        best_score = score;
      }
    }
    order[best] = rank;
    alive[best] = 0;
    --remaining;
    for (auto& [nb, w] : innb[best]) {
      if (alive[nb]) outw[nb] -= w;
    }
    for (auto& [nb, w] : outnb[best]) {
      if (alive[nb]) {
        inw[nb] -= w;
        indeg[nb] -= 1;
      }
    }
    // lazily drop edges into the removed node from neighbors' indegree
    for (auto& [nb, w] : innb[best]) {
      (void)nb;
      (void)w;
    }
  }
}

// Padded per-track observation tensors (build_observations semantics):
// for each track with >= min_len observations, keep up to max_obs uniformly
// strided observation slots. Returns the number of kept tracks.
// frame_idx/uv/mask_out are laid out [num_tracks_cap, max_obs(,2)].
int64_t psfm_build_observations(int64_t num_tracks, int32_t num_frames,
                                const uint8_t* mask /* [N,T] */,
                                const float* xy /* [N,T,2] */,
                                int32_t min_len, int32_t max_obs,
                                int32_t* frame_idx_out, float* uv_out,
                                uint8_t* mask_out, int64_t* track_rows_out) {
  int64_t kept = 0;
  std::vector<int32_t> frames;
  frames.reserve(num_frames);
  for (int64_t n = 0; n < num_tracks; ++n) {
    frames.clear();
    const uint8_t* m = mask + n * num_frames;
    for (int32_t t = 0; t < num_frames; ++t)
      if (m[t]) frames.push_back(t);
    if ((int32_t)frames.size() < min_len) continue;
    int32_t L = (int32_t)frames.size();
    int32_t* fo = frame_idx_out + kept * max_obs;
    float* uo = uv_out + kept * max_obs * 2;
    uint8_t* mo = mask_out + kept * max_obs;
    std::memset(fo, 0, sizeof(int32_t) * max_obs);
    std::memset(uo, 0, sizeof(float) * max_obs * 2);
    std::memset(mo, 0, sizeof(uint8_t) * max_obs);
    int32_t count = std::min(L, max_obs);
    for (int32_t k = 0; k < count; ++k) {
      int32_t t = (L <= max_obs)
                      ? frames[k]
                      : frames[(int32_t)((double)k * (L - 1) / (count - 1) + 0.5)];
      fo[k] = t;
      uo[2 * k] = xy[(n * num_frames + t) * 2];
      uo[2 * k + 1] = xy[(n * num_frames + t) * 2 + 1];
      mo[k] = 1;
    }
    track_rows_out[kept] = n;
    ++kept;
  }
  return kept;
}

// Covisibility counts: upper-triangular [T,T] image-pair counts from the
// observation mask (one pass over tracks; the correspondence-graph equivalent).
void psfm_covisibility(int64_t num_tracks, int32_t num_frames,
                       const uint8_t* mask, int32_t* covis /* [T,T] out */) {
  std::memset(covis, 0, sizeof(int32_t) * num_frames * num_frames);
  std::vector<int32_t> frames;
  for (int64_t n = 0; n < num_tracks; ++n) {
    frames.clear();
    const uint8_t* m = mask + n * num_frames;
    for (int32_t t = 0; t < num_frames; ++t)
      if (m[t]) frames.push_back(t);
    for (size_t a = 0; a < frames.size(); ++a)
      for (size_t b = a + 1; b < frames.size(); ++b)
        covis[frames[a] * num_frames + frames[b]] += 1;
  }
}

// Per-pair padded correspondence tensors (build_pair_tensors semantics):
// for each kept pair (i, j), stream the tracks observed in both frames in
// track order; when a pair has more than max_m common tracks, keep the
// caller-provided sorted random positions. One O(sum L^2) pass over tracks
// instead of E passes over the [N] mask columns.
void psfm_build_pair_tensors(int64_t num_tracks, int32_t num_frames,
                             const uint8_t* mask /* [N,T] */,
                             const float* xy /* [N,T,2] */, int32_t max_m,
                             int64_t num_pairs,
                             const int32_t* pairs /* [E,2] */,
                             const int32_t* counts /* [E] */,
                             const int64_t* sel /* [E,M] sorted positions among
                                 the pair's common tracks; only read when
                                 counts[e] > max_m (random subset chosen by the
                                 caller — a deterministic stride aliases with
                                 the tracker's row-major spawn grid and
                                 concentrates samples on image columns) */,
                             float* uv1 /* [E,M,2] */, float* uv2,
                             uint8_t* pmask /* [E,M] */,
                             int64_t* tidx /* [E,M] */) {
  // pair id lookup
  std::vector<int64_t> pid(static_cast<int64_t>(num_frames) * num_frames, -1);
  for (int64_t e = 0; e < num_pairs; ++e)
    pid[pairs[2 * e] * num_frames + pairs[2 * e + 1]] = e;
  // per-pair cursors: c = index among common tracks seen so far,
  // w = next output slot, next_sel = c value of the next selected track
  std::vector<int64_t> ccur(num_pairs, 0), wcur(num_pairs, 0);
  for (int64_t e = 0; e < num_pairs; ++e) {
    std::memset(pmask + e * max_m, 0, max_m);
    for (int32_t k = 0; k < max_m; ++k) tidx[e * max_m + k] = -1;
  }
  auto sel_pos = [&](int64_t e, int64_t k) -> int64_t {
    if (counts[e] <= max_m) return k;
    return sel[e * max_m + k];
  };
  std::vector<int32_t> frames;
  frames.reserve(num_frames);
  for (int64_t n = 0; n < num_tracks; ++n) {
    frames.clear();
    const uint8_t* m = mask + n * num_frames;
    for (int32_t t = 0; t < num_frames; ++t)
      if (m[t]) frames.push_back(t);
    for (size_t a = 0; a < frames.size(); ++a)
      for (size_t b = a + 1; b < frames.size(); ++b) {
        int64_t e = pid[frames[a] * num_frames + frames[b]];
        if (e < 0) continue;
        int64_t c = ccur[e]++;
        int64_t w = wcur[e];
        if (w >= max_m || c != sel_pos(e, w)) continue;
        uv1[(e * max_m + w) * 2] = xy[(n * num_frames + frames[a]) * 2];
        uv1[(e * max_m + w) * 2 + 1] = xy[(n * num_frames + frames[a]) * 2 + 1];
        uv2[(e * max_m + w) * 2] = xy[(n * num_frames + frames[b]) * 2];
        uv2[(e * max_m + w) * 2 + 1] = xy[(n * num_frames + frames[b]) * 2 + 1];
        pmask[e * max_m + w] = 1;
        tidx[e * max_m + w] = n;
        wcur[e] = w + 1;
      }
  }
}

}  // extern "C"
