// Native host kernels for lfr_tpu's irregular graph work.
//
// The maximum-spanning-forest track builder is inherently sequential (it
// consumes edges in global similarity order, and each union depends on all
// prior ones), so it stays on the host CPU; this C++ version replaces the
// reference's pointer-chasing implementation
// (reference: multi-view-refinement/solve.cc:67-77,488-541) with flat
// arrays, sorted-vector image sets, and iterative path compression.

#include <cstdint>
#include <vector>
#include <algorithm>

extern "C" {

// Union-find with image-disjoint merge constraint.
//
//   order:      edge indices sorted by descending similarity
//   src/dst:    undirected match endpoints (node ids)
//   node_image: image id per node
//   parent:     out, -1 for roots (pre-initialized by caller)
void lfr_msf_union_find(
    int64_t n_edges,
    const int64_t* order,
    const int64_t* src,
    const int64_t* dst,
    int64_t n_nodes,
    const int64_t* node_image,
    int64_t* parent) {
  // Per-root sorted image-id sets; smaller always merges into larger.
  std::vector<std::vector<int64_t>> images(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i) {
    images[i].push_back(node_image[i]);
  }

  std::vector<int64_t> stack;
  auto find = [&](int64_t node) {
    int64_t root = node;
    while (parent[root] != -1) root = parent[root];
    // Iterative path compression.
    while (parent[node] != -1) {
      int64_t next = parent[node];
      parent[node] = root;
      node = next;
    }
    return root;
  };

  std::vector<int64_t> merged;
  for (int64_t e = 0; e < n_edges; ++e) {
    const int64_t idx = order[e];
    int64_t r1 = find(src[idx]);
    int64_t r2 = find(dst[idx]);
    if (r1 == r2) continue;

    auto& s1 = images[r1];
    auto& s2 = images[r2];
    // Reject merges sharing any image (one feature per image per track).
    const auto* small = &s1;
    const auto* big = &s2;
    if (small->size() > big->size()) std::swap(small, big);
    bool overlap = false;
    for (int64_t img : *small) {
      if (std::binary_search(big->begin(), big->end(), img)) {
        overlap = true;
        break;
      }
    }
    if (overlap) continue;

    // Smaller-image-set tree merges into larger.
    if (s1.size() < s2.size()) std::swap(r1, r2);
    parent[r2] = r1;
    auto& keep = images[r1];
    auto& give = images[r2];
    merged.clear();
    merged.reserve(keep.size() + give.size());
    std::merge(keep.begin(), keep.end(), give.begin(), give.end(),
               std::back_inserter(merged));
    keep.swap(merged);
    give.clear();
    give.shrink_to_fit();
  }
}

}  // extern "C"
