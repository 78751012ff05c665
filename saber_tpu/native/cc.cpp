// Fast connected-component labeling (2D/3D) via run-based union-find.
//
// Native runtime component of saber-tpu: CC labeling is the framework's
// hottest host-side operation (reference call sites: scipy.ndimage.label in
// saber/segmenters/utils.py:108, filters/masks.py:89, analysis/
// refine_membranes.py:145, classifier/datasets/singleZarrDataset.py:72).
// XLA has no CC primitive (SURVEY.md §7 "hard parts"), so large label maps
// run here instead of through scipy's generic N-D correlate machinery.
//
// Algorithm: rows decompose into foreground runs; runs union with
// overlapping runs in the (≤4) backward neighbor rows via a two-pointer
// sweep — O(runs) instead of O(voxels·neighbors). Connectivity follows
// scipy semantics (1 = faces, 2 = +edges, 3 = +corners); diagonal
// adjacency widens the overlap window by one.
//
// Build: make -C saber_tpu/native  (g++ -O3 -shared -fPIC)
// Binding: ctypes (saber_tpu/native/cc.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;

  int32_t make() {
    parent.push_back(static_cast<int32_t>(parent.size()));
    return parent.back();
  }

  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];
      x = parent[x];
    }
    return x;
  }

  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a < b)
      parent[b] = a;
    else if (b < a)
      parent[a] = b;
  }
};

struct Run {
  int32_t start;  // inclusive x
  int32_t end;    // exclusive x
  int32_t label;  // union-find id
};

// Merge runs of `cur` with overlapping runs of `prev`; `ext` widens the
// window for diagonal adjacency (runs [s1,e1) and [s2,e2) are adjacent iff
// s1 < e2 + ext and s2 < e1 + ext).
inline void merge_rows(std::vector<Run>& cur, const std::vector<Run>& prev,
                       int ext, UnionFind& uf) {
  size_t j = 0;
  for (auto& r : cur) {
    // advance past prev runs that end before our window
    while (j < prev.size() &&
           static_cast<int64_t>(prev[j].end) + ext <= r.start)
      ++j;
    for (size_t k = j; k < prev.size() &&
                       static_cast<int64_t>(prev[k].start) < r.end + ext;
         ++k) {
      uf.unite(r.label, prev[k].label);
    }
  }
}

}  // namespace

extern "C" {

// mask: flat uint8 (0 = background); out: int32 labels (same size).
// connectivity: 1 = faces, 2 = +edges, 3 = +corners (scipy semantics).
// 2D arrays pass nz = 1. Returns component count, or -1 on error.
int64_t cc_label_3d(const uint8_t* mask, int64_t nz, int64_t ny, int64_t nx,
                    int connectivity, int32_t* out) {
  const int64_t n = nz * ny * nx;
  if (n <= 0) return -1;

  UnionFind uf;
  // runs for the previous z-plane (ny rows) and the current plane
  std::vector<std::vector<Run>> prev_plane(ny), cur_plane(ny);

  const int same_plane_ext = connectivity >= 2 ? 1 : 0;  // (z, y-1)
  const int below_same_ext = connectivity >= 2 ? 1 : 0;  // (z-1, y)
  const bool below_diag = connectivity >= 2;             // (z-1, y±1)
  const int below_diag_ext = connectivity >= 3 ? 1 : 0;

  for (int64_t z = 0; z < nz; ++z) {
    for (auto& row : cur_plane) row.clear();
    for (int64_t y = 0; y < ny; ++y) {
      const uint8_t* mrow = mask + (z * ny + y) * nx;
      auto& runs = cur_plane[y];
      int64_t x = 0;
      while (x < nx) {
        if (!mrow[x]) {
          ++x;
          continue;
        }
        int64_t s = x;
        while (x < nx && mrow[x]) ++x;
        runs.push_back({static_cast<int32_t>(s), static_cast<int32_t>(x),
                        uf.make()});
      }
      if (runs.empty()) continue;
      if (y > 0) merge_rows(runs, cur_plane[y - 1], same_plane_ext, uf);
      if (z > 0) {
        merge_rows(runs, prev_plane[y], below_same_ext, uf);
        if (below_diag) {
          if (y > 0) merge_rows(runs, prev_plane[y - 1], below_diag_ext, uf);
          if (y + 1 < ny)
            merge_rows(runs, prev_plane[y + 1], below_diag_ext, uf);
        }
      }
    }
    // paint provisional ids for this plane (final remap happens below via
    // a second sweep over stored runs — store them)
    std::swap(prev_plane, cur_plane);
    // stash the plane's runs into out as provisional ids (+1)
    for (int64_t y = 0; y < ny; ++y) {
      int32_t* orow = out + (z * ny + y) * nx;
      std::memset(orow, 0, sizeof(int32_t) * nx);
      for (const auto& r : prev_plane[y]) {
        for (int32_t xx = r.start; xx < r.end; ++xx) orow[xx] = r.label + 1;
      }
    }
  }

  // Compact roots to 1..n_components in first-appearance order. Ids are
  // created in scan order and unite() keeps the minimum id as root, so a
  // component's root IS its first-appearing run — ordering roots by id
  // reproduces scipy's first-appearance labeling exactly. Resolving the
  // whole id → compact-label table up front (O(ids)) turns the final
  // voxel pass into a plain table lookup; the per-voxel find() here was
  // why 2D labeling lost to scipy before (docs/benchmarks.md).
  const size_t nids = uf.parent.size();
  std::vector<int32_t> full_map(nids + 1, 0);  // [0] = background
  int32_t next = 0;
  for (size_t i = 0; i < nids; ++i)
    if (uf.find(static_cast<int32_t>(i)) == static_cast<int32_t>(i))
      full_map[i + 1] = ++next;
  for (size_t i = 0; i < nids; ++i)
    full_map[i + 1] = full_map[uf.find(static_cast<int32_t>(i)) + 1];
  for (int64_t i = 0; i < n; ++i) out[i] = full_map[out[i]];
  return next;
}

int64_t cc_label_2d(const uint8_t* mask, int64_t ny, int64_t nx,
                    int connectivity, int32_t* out) {
  return cc_label_3d(mask, 1, ny, nx, connectivity, out);
}

}  // extern "C"
