// Fast connected-component labeling (2D/3D) via two-pass union-find.
//
// Native runtime component of saber-tpu: CC labeling is the framework's
// hottest host-side operation (reference call sites: scipy.ndimage.label in
// saber/segmenters/utils.py:108, filters/masks.py:89, analysis/
// refine_membranes.py:145, classifier/datasets/singleZarrDataset.py:72).
// XLA has no CC primitive (SURVEY.md §7 "hard parts"), so large label maps
// run here instead of through scipy's generic N-D correlate machinery:
// a flat raster scan with backward-neighbor merging, path-halving
// union-find, and a compaction pass.
//
// Build: make -C saber_tpu/native  (g++ -O3 -shared -fPIC)
// Binding: ctypes (saber_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int32_t> parent;

  explicit UnionFind(size_t cap) { parent.reserve(cap); }

  int32_t make() {
    parent.push_back(static_cast<int32_t>(parent.size()));
    return parent.back();
  }

  int32_t find(int32_t x) {
    while (parent[x] != x) {
      parent[x] = parent[parent[x]];  // path halving
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

}  // namespace

extern "C" {

// mask: flat uint8 array (0 = background); out: int32 labels (same size).
// shape: up to 3 dims; 2D arrays pass nz=1.
// connectivity: 1 = faces only, 2 = +edges, 3 = +corners (scipy semantics).
// Returns the number of components (labels 1..n), or -1 on error.
int64_t cc_label_3d(const uint8_t* mask, int64_t nz, int64_t ny, int64_t nx,
                    int connectivity, int32_t* out) {
  const int64_t n = nz * ny * nx;
  if (n <= 0) return -1;
  std::memset(out, 0, sizeof(int32_t) * n);

  // backward neighbor offsets (dz, dy, dx) for the requested connectivity
  struct Off { int dz, dy, dx; };
  std::vector<Off> offs;
  for (int dz = -1; dz <= 0; ++dz)
    for (int dy = -1; dy <= 1; ++dy)
      for (int dx = -1; dx <= 1; ++dx) {
        if (dz == 0 && (dy > 0 || (dy == 0 && dx >= 0))) continue;
        int order = (dz != 0) + (dy != 0) + (dx != 0);
        if (order == 0 || order > connectivity) continue;
        offs.push_back({dz, dy, dx});
      }

  UnionFind uf(1024);
  // provisional labels stored as (index into uf) + 1 in out
  for (int64_t z = 0; z < nz; ++z) {
    for (int64_t y = 0; y < ny; ++y) {
      const int64_t row = (z * ny + y) * nx;
      for (int64_t x = 0; x < nx; ++x) {
        const int64_t i = row + x;
        if (!mask[i]) continue;
        int32_t lbl = -1;
        for (const auto& o : offs) {
          const int64_t zz = z + o.dz, yy = y + o.dy, xx = x + o.dx;
          if (zz < 0 || yy < 0 || yy >= ny || xx < 0 || xx >= nx) continue;
          const int64_t j = (zz * ny + yy) * nx + xx;
          const int32_t nl = out[j];
          if (nl > 0) {
            if (lbl < 0)
              lbl = nl - 1;
            else
              uf.unite(lbl, nl - 1);
          }
        }
        if (lbl < 0) lbl = uf.make();
        out[i] = lbl + 1;
      }
    }
  }

  // compact roots to 1..n_components
  std::vector<int32_t> remap(uf.parent.size(), 0);
  int32_t next = 0;
  for (size_t k = 0; k < uf.parent.size(); ++k) {
    const int32_t r = uf.find(static_cast<int32_t>(k));
    if (remap[r] == 0 && static_cast<size_t>(r) == k) remap[r] = ++next;
  }
  // roots found lazily above only when root==k in order; ensure all roots map
  for (size_t k = 0; k < uf.parent.size(); ++k) {
    const int32_t r = uf.find(static_cast<int32_t>(k));
    if (remap[r] == 0) remap[r] = ++next;
  }

  for (int64_t i = 0; i < n; ++i) {
    if (out[i] > 0) out[i] = remap[uf.find(out[i] - 1)];
  }
  return next;
}

int64_t cc_label_2d(const uint8_t* mask, int64_t ny, int64_t nx,
                    int connectivity, int32_t* out) {
  // 2D: connectivity 1 = 4-conn, 2 = 8-conn; reuse the 3D kernel with nz=1
  // (dz offsets never fire).
  return cc_label_3d(mask, 1, ny, nx, connectivity, out);
}

}  // extern "C"
