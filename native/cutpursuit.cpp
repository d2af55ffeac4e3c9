// Superpoint graph partitioning — native solver for the PartSlip slot.
//
// The reference vendors the boost::python L0 cut-pursuit solver
// (reference PartSlip/partition/cut-pursuit/, ~4.1k LoC) to partition a
// KNN point graph into geometrically coherent superpoints. This is a
// from-scratch C implementation of two solvers behind one C ABI:
//
//  1. fh_segment:  Felzenszwalb-Huttenlocher graph segmentation on feature
//     distances — near-linear, the fast default.
//  2. cutpursuit:  L0 cut-pursuit in the greedy working-set style:
//     alternate (a) per-component 2-means splits on features with
//     connected-component cleanup (approximating the binary min-cut step)
//     and (b) a merge pass that undoes splits whose boundary penalty
//     outweighs the data-term gain. Energy:
//        E = sum_i ||x_i - mu_comp(i)||^2 + reg * sum_cut_edges w_ij
//
// Exposed via ctypes (no pybind11 in this toolchain).
//
// Build: g++ -O3 -shared -fPIC -o libcutpursuit.so cutpursuit.cpp
#include <cstdint>
#include <cstring>
#include <vector>
#include <queue>
#include <algorithm>
#include <cmath>
#include <random>

namespace {

struct UnionFind {
  std::vector<int> parent, rank_;
  explicit UnionFind(int n) : parent(n), rank_(n, 0) {
    for (int i = 0; i < n; ++i) parent[i] = i;
  }
  int find(int x) {
    while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
    return x;
  }
  bool unite(int a, int b) {
    a = find(a); b = find(b);
    if (a == b) return false;
    if (rank_[a] < rank_[b]) std::swap(a, b);
    parent[b] = a;
    if (rank_[a] == rank_[b]) rank_[a]++;
    return true;
  }
};

inline float sqdist(const float* a, const float* b, int d) {
  float s = 0.f;
  for (int k = 0; k < d; ++k) { float t = a[k] - b[k]; s += t * t; }
  return s;
}

}  // namespace

extern "C" {

// Felzenszwalb-Huttenlocher segmentation.
//  feats: n x d, edges: (src, dst, w) x m (w scales the feature distance),
//  k: granularity constant, min_size: small-component merge threshold.
// Writes labels [0, n_components) to labels_out; returns component count.
int fh_segment(int n, int d, int64_t m, const float* feats,
               const uint32_t* src, const uint32_t* dst,
               const float* edge_w, float k, int min_size,
               int32_t* labels_out) {
  struct E { float w; uint32_t a, b; };
  std::vector<E> edges(m);
  for (int64_t e = 0; e < m; ++e) {
    float fw = std::sqrt(sqdist(feats + (size_t)src[e] * d,
                                feats + (size_t)dst[e] * d, d));
    edges[e] = {fw * (edge_w ? edge_w[e] : 1.f), src[e], dst[e]};
  }
  std::sort(edges.begin(), edges.end(),
            [](const E& x, const E& y) { return x.w < y.w; });

  UnionFind uf(n);
  std::vector<float> internal(n, 0.f);
  std::vector<int> size(n, 1);
  for (const E& e : edges) {
    int a = uf.find(e.a), b = uf.find(e.b);
    if (a == b) continue;
    float ta = internal[a] + k / size[a];
    float tb = internal[b] + k / size[b];
    if (e.w <= std::min(ta, tb)) {
      uf.unite(a, b);
      int r = uf.find(a);
      internal[r] = std::max({internal[a], internal[b], e.w});
      size[r] = size[a] + size[b];
    }
  }
  // merge small components into their first neighbor
  for (const E& e : edges) {
    int a = uf.find(e.a), b = uf.find(e.b);
    if (a != b && (size[a] < min_size || size[b] < min_size)) {
      uf.unite(a, b);
      int r = uf.find(a);
      size[r] = size[a] + size[b];
    }
  }
  // compact labels
  std::vector<int32_t> remap(n, -1);
  int next = 0;
  for (int i = 0; i < n; ++i) {
    int r = uf.find(i);
    if (remap[r] < 0) remap[r] = next++;
    labels_out[i] = remap[r];
  }
  return next;
}

// L0 cut-pursuit (greedy split/merge variant). Returns component count.
int cutpursuit(int n, int d, int64_t m, const float* feats,
               const uint32_t* src, const uint32_t* dst,
               const float* edge_w, float reg, int max_iter,
               int32_t* labels_out) {
  // adjacency
  std::vector<int64_t> head(n + 1, 0);
  for (int64_t e = 0; e < m; ++e) head[src[e] + 1]++;
  for (int i = 0; i < n; ++i) head[i + 1] += head[i];
  std::vector<uint32_t> adj(m);
  std::vector<float> adj_w(m);
  {
    std::vector<int64_t> cur(head.begin(), head.end() - 1);
    for (int64_t e = 0; e < m; ++e) {
      adj[cur[src[e]]] = dst[e];
      adj_w[cur[src[e]]] = edge_w ? edge_w[e] : 1.f;
      cur[src[e]]++;
    }
  }

  std::vector<int32_t> label(n, 0);
  int n_comp = 1;
  std::mt19937 rng(0);

  auto connected_relabel = [&]() {
    // split label groups into graph-connected components
    std::vector<int32_t> out(n, -1);
    int next = 0;
    std::vector<int> stack;
    for (int s = 0; s < n; ++s) {
      if (out[s] >= 0) continue;
      out[s] = next;
      stack.push_back(s);
      while (!stack.empty()) {
        int i = stack.back(); stack.pop_back();
        for (int64_t e = head[i]; e < head[i + 1]; ++e) {
          uint32_t j = adj[e];
          if (out[j] < 0 && label[j] == label[s]) {
            out[j] = next;
            stack.push_back(j);
          }
        }
      }
      next++;
    }
    label.assign(out.begin(), out.end());
    return next;
  };
  n_comp = connected_relabel();

  for (int iter = 0; iter < max_iter; ++iter) {
    // component stats
    std::vector<std::vector<int>> members(n_comp);
    for (int i = 0; i < n; ++i) members[label[i]].push_back(i);

    bool changed = false;
    int next_label = n_comp;
    for (int c = 0; c < n_comp; ++c) {
      auto& mem = members[c];
      if ((int)mem.size() < 2) continue;
      // 2-means on features (kmeans++-ish init: farthest pair heuristic)
      std::vector<float> mu0(d), mu1(d);
      const float* p0 = feats + (size_t)mem[rng() % mem.size()] * d;
      // farthest from p0
      float best = -1.f; int far_i = mem[0];
      for (int i : mem) {
        float dd = sqdist(feats + (size_t)i * d, p0, d);
        if (dd > best) { best = dd; far_i = i; }
      }
      std::memcpy(mu0.data(), p0, d * sizeof(float));
      std::memcpy(mu1.data(), feats + (size_t)far_i * d, d * sizeof(float));

      std::vector<uint8_t> side(mem.size(), 0);
      for (int it2 = 0; it2 < 8; ++it2) {
        bool moved = false;
        for (size_t t = 0; t < mem.size(); ++t) {
          const float* f = feats + (size_t)mem[t] * d;
          uint8_t s = sqdist(f, mu1.data(), d) < sqdist(f, mu0.data(), d);
          if (s != side[t]) { side[t] = s; moved = true; }
        }
        if (!moved && it2 > 0) break;
        std::vector<double> acc0(d, 0), acc1(d, 0);
        int c0 = 0, c1 = 0;
        for (size_t t = 0; t < mem.size(); ++t) {
          const float* f = feats + (size_t)mem[t] * d;
          if (side[t]) { for (int k2 = 0; k2 < d; ++k2) acc1[k2] += f[k2]; c1++; }
          else { for (int k2 = 0; k2 < d; ++k2) acc0[k2] += f[k2]; c0++; }
        }
        if (c0 == 0 || c1 == 0) break;
        for (int k2 = 0; k2 < d; ++k2) {
          mu0[k2] = (float)(acc0[k2] / c0);
          mu1[k2] = (float)(acc1[k2] / c1);
        }
      }
      // energy delta: data-term gain - reg * new cut weight
      std::vector<double> mu(d, 0);
      for (int i : mem)
        for (int k2 = 0; k2 < d; ++k2) mu[k2] += feats[(size_t)i * d + k2];
      for (int k2 = 0; k2 < d; ++k2) mu[k2] /= mem.size();
      double e_one = 0, e_two = 0;
      std::vector<float> muf(d);
      for (int k2 = 0; k2 < d; ++k2) muf[k2] = (float)mu[k2];
      for (size_t t = 0; t < mem.size(); ++t) {
        const float* f = feats + (size_t)mem[t] * d;
        e_one += sqdist(f, muf.data(), d);
        e_two += sqdist(f, side[t] ? mu1.data() : mu0.data(), d);
      }
      double cut = 0;
      std::vector<uint8_t> side_of(n, 0);
      for (size_t t = 0; t < mem.size(); ++t) side_of[mem[t]] = side[t];
      for (int i : mem)
        for (int64_t e = head[i]; e < head[i + 1]; ++e) {
          uint32_t j = adj[e];
          if (label[j] == c && side_of[i] != side_of[j]) cut += adj_w[e];
        }
      cut *= 0.5;  // edges counted twice on a symmetric graph
      if (e_two + reg * cut < e_one - 1e-9) {
        for (size_t t = 0; t < mem.size(); ++t)
          if (side[t]) label[mem[t]] = next_label;
        next_label++;
        changed = true;
      }
    }
    if (!changed) break;
    n_comp = connected_relabel();

    // merge pass: undo boundaries not worth their penalty
    std::vector<std::vector<double>> mean(n_comp, std::vector<double>(d, 0));
    std::vector<int> cnt(n_comp, 0);
    for (int i = 0; i < n; ++i) {
      for (int k2 = 0; k2 < d; ++k2) mean[label[i]][k2] += feats[(size_t)i * d + k2];
      cnt[label[i]]++;
    }
    for (int c = 0; c < n_comp; ++c)
      for (int k2 = 0; k2 < d; ++k2) mean[c][k2] /= std::max(cnt[c], 1);
    // boundary weights between component pairs
    std::vector<std::pair<int64_t, float>> bnd;  // key = a*ncomp+b
    {
      std::vector<std::pair<int64_t, float>> raw;
      for (int i = 0; i < n; ++i)
        for (int64_t e = head[i]; e < head[i + 1]; ++e) {
          int a = label[i], b = label[adj[e]];
          if (a < b) raw.push_back({(int64_t)a * n_comp + b, adj_w[e]});
        }
      std::sort(raw.begin(), raw.end());
      for (size_t t = 0; t < raw.size();) {
        size_t u = t; float s = 0;
        while (u < raw.size() && raw[u].first == raw[t].first) s += raw[u++].second;
        bnd.push_back({raw[t].first, s});
        t = u;
      }
    }
    UnionFind uf(n_comp);
    for (auto& [key, w] : bnd) {
      int a = uf.find((int)(key / n_comp)), b = uf.find((int)(key % n_comp));
      if (a == b) continue;
      // data-term increase if merged (pooled variance vs split means)
      double inc = 0;
      int ca = cnt[a], cb = cnt[b];
      double denom = ca + cb;
      for (int k2 = 0; k2 < d; ++k2) {
        double diff = mean[a][k2] - mean[b][k2];
        inc += (double)ca * cb / denom * diff * diff;
      }
      if (inc < reg * w) {
        uf.unite(a, b);
        int r = uf.find(a);
        for (int k2 = 0; k2 < d; ++k2)
          mean[r][k2] = (mean[a][k2] * ca + mean[b][k2] * cb) / denom;
        cnt[r] = ca + cb;
      }
    }
    for (int i = 0; i < n; ++i) label[i] = uf.find(label[i]);
    n_comp = connected_relabel();
  }

  std::memcpy(labels_out, label.data(), n * sizeof(int32_t));
  return n_comp;
}

}  // extern "C"
