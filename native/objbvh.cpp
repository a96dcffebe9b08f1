// Native scene-compile fast path: OBJ parsing and threaded-BVH
// construction.
//
// The reference does all of its host-side init work in native code (the
// whole renderer is one Rust binary; OBJ streaming at loader.rs:12-59 and
// the recursive median-split BVH at bvh.rs:107-211).  The TPU build keeps
// device work in XLA but gives the host-side scene compiler the same
// native treatment: this library parses OBJ files and emits the threaded
// flat BVH arrays directly, called from Python over ctypes.  Semantics are
// identical to the pure-Python fallback in
// hanamaru_tpu/scene/bvh.py / utils/obj.py (cross-checked by tests).
//
// Build: make -C native   (produces libobjbvh.so)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// OBJ parsing (reference semantics: only v/f records, 1-based indices,
// quads fan as (v1,v2,v3)+(v1,v3,v4))
// ---------------------------------------------------------------------------

struct ObjData {
  std::vector<double> verts;   // xyz triples
  std::vector<int32_t> faces;  // index triples
};

// Returns an opaque handle; query + copy out; then free.
void* obj_parse(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* out = new ObjData();
  char line[1024];
  while (fgets(line, sizeof line, f)) {
    if (line[0] == 'v' && line[1] == ' ') {
      double x, y, z;
      if (sscanf(line + 2, "%lf %lf %lf", &x, &y, &z) == 3) {
        out->verts.push_back(x);
        out->verts.push_back(y);
        out->verts.push_back(z);
      }
    } else if (line[0] == 'f' && line[1] == ' ') {
      // up to 4 vertex slots; each may be i, i/j, i/j/k, i//k
      int32_t idx[4];
      int n = 0;
      const char* p = line + 2;
      while (*p && n < 4) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\0' || *p == '\n' || *p == '\r') break;
        long v = strtol(p, const_cast<char**>(&p), 10);
        if (v == 0) break;
        idx[n++] = static_cast<int32_t>(v - 1);
        while (*p && *p != ' ' && *p != '\n' && *p != '\r') ++p;  // skip /j/k
      }
      if (n >= 3) {
        out->faces.push_back(idx[0]);
        out->faces.push_back(idx[1]);
        out->faces.push_back(idx[2]);
      }
      if (n == 4) {
        out->faces.push_back(idx[0]);
        out->faces.push_back(idx[2]);
        out->faces.push_back(idx[3]);
      }
    }
  }
  fclose(f);
  return out;
}

int64_t obj_num_verts(void* h) { return static_cast<ObjData*>(h)->verts.size() / 3; }
int64_t obj_num_faces(void* h) { return static_cast<ObjData*>(h)->faces.size() / 3; }

void obj_copy(void* h, double* verts_out, int32_t* faces_out) {
  auto* d = static_cast<ObjData*>(h);
  memcpy(verts_out, d->verts.data(), d->verts.size() * sizeof(double));
  memcpy(faces_out, d->faces.data(), d->faces.size() * sizeof(int32_t));
}

void obj_free(void* h) { delete static_cast<ObjData*>(h); }

// ---------------------------------------------------------------------------
// Threaded BVH build (median split along the longest axis, sorted by a
// caller-provided per-axis key; leaf when count/2 <= 2 — bvh.rs:107-153)
// ---------------------------------------------------------------------------

struct BvhOut {
  std::vector<float> mins, maxs;         // xyz triples per node
  std::vector<int32_t> hit, miss, first, count, order;
  int32_t depth = 0;
};

struct Builder {
  const float* aabb_min;   // [n,3]
  const float* aabb_max;
  const double* sort_key;  // [n,3]
  BvhOut out;

  // Emits the subtree over indices [lo, hi) of `idx`, with `escape` as the
  // DFS exit; returns subtree depth.  Same ordering semantics as the
  // reference sort+split_off (lower half first).
  int emit(std::vector<int32_t>& idx, size_t lo, size_t hi, int32_t escape,
           int depth) {
    const size_t node = out.hit.size();
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    for (size_t i = lo; i < hi; ++i) {
      const int32_t p = idx[i];
      for (int a = 0; a < 3; ++a) {
        mn[a] = std::min(mn[a], aabb_min[3 * p + a]);
        mx[a] = std::max(mx[a], aabb_max[3 * p + a]);
      }
    }
    out.mins.insert(out.mins.end(), mn, mn + 3);
    out.maxs.insert(out.maxs.end(), mx, mx + 3);
    out.hit.push_back(0);
    out.miss.push_back(escape);
    out.first.push_back(-1);
    out.count.push_back(0);

    const size_t n = hi - lo;
    const size_t mid = n / 2;
    if (mid <= 2) {  // leaf (1..=5 prims)
      out.first[node] = static_cast<int32_t>(out.order.size());
      out.count[node] = static_cast<int32_t>(n);
      out.order.insert(out.order.end(), idx.begin() + lo, idx.begin() + hi);
      out.hit[node] = escape;
      return depth;
    }
    const float ex = mx[0] - mn[0], ey = mx[1] - mn[1], ez = mx[2] - mn[2];
    int axis;  // strict comparisons, z on ties (bvh.rs:121-145)
    if (ex > ey && ex > ez) axis = 0;
    else if (ey > ex && ey > ez) axis = 1;
    else axis = 2;
    std::stable_sort(idx.begin() + lo, idx.begin() + hi,
                     [&](int32_t a, int32_t b) {
                       return sort_key[3 * a + axis] < sort_key[3 * b + axis];
                     });

    out.hit[node] = static_cast<int32_t>(node + 1);
    const int d1 = emit(idx, lo, lo + mid, -2, depth + 1);
    const int32_t right = static_cast<int32_t>(out.hit.size());
    // patch the left subtree's unresolved (-2) exits to the right child
    for (size_t j = node + 1; j < out.hit.size(); ++j) {
      if (out.miss[j] == -2) out.miss[j] = right;
      if (out.first[j] >= 0 && out.hit[j] == -2) out.hit[j] = right;
    }
    const int d2 = emit(idx, lo + mid, hi, escape, depth + 1);
    return std::max(d1, d2);
  }
};

void* bvh_build(int64_t n, const float* aabb_min, const float* aabb_max,
                const double* sort_key) {
  auto* b = new Builder{aabb_min, aabb_max, sort_key, {}};
  if (n > 0) {
    std::vector<int32_t> idx(n);
    for (int64_t i = 0; i < n; ++i) idx[i] = static_cast<int32_t>(i);
    b->out.depth = b->emit(idx, 0, idx.size(), -1, 1);
  } else {
    b->out.mins = {0, 0, 0};
    b->out.maxs = {0, 0, 0};
    b->out.hit = {-1};
    b->out.miss = {-1};
    b->out.first = {0};
    b->out.count = {0};
    b->out.depth = 1;
  }
  return b;
}

int64_t bvh_num_nodes(void* h) { return static_cast<Builder*>(h)->out.hit.size(); }
int32_t bvh_depth(void* h) { return static_cast<Builder*>(h)->out.depth; }

void bvh_copy(void* h, float* mins, float* maxs, int32_t* hit, int32_t* miss,
              int32_t* first, int32_t* count, int32_t* order) {
  auto& o = static_cast<Builder*>(h)->out;
  memcpy(mins, o.mins.data(), o.mins.size() * sizeof(float));
  memcpy(maxs, o.maxs.data(), o.maxs.size() * sizeof(float));
  memcpy(hit, o.hit.data(), o.hit.size() * sizeof(int32_t));
  memcpy(miss, o.miss.data(), o.miss.size() * sizeof(int32_t));
  memcpy(first, o.first.data(), o.first.size() * sizeof(int32_t));
  memcpy(count, o.count.data(), o.count.size() * sizeof(int32_t));
  memcpy(order, o.order.data(), o.order.size() * sizeof(int32_t));
}

void bvh_free(void* h) { delete static_cast<Builder*>(h); }

// ---------------------------------------------------------------------------
// Per-direction-octant re-threading for front-to-back traversal (see
// hanamaru_tpu/scene/bvh.py octant_links for the derivation: left child of
// inner node i is i+1, right child is the left child's miss link).
// Outputs are [8, n] row-major.
// ---------------------------------------------------------------------------
void bvh_octant_links(int64_t n, const float* mins, const float* maxs,
                      const int32_t* hit, const int32_t* miss,
                      const int32_t* count, int32_t* hit8, int32_t* miss8) {
  std::vector<int32_t> escape(n);
  for (int o = 0; o < 8; ++o) {
    int32_t* H = hit8 + o * n;
    int32_t* M = miss8 + o * n;
    if (n > 0) escape[0] = -1;
    for (int64_t i = 0; i < n; ++i) {
      const int32_t e = escape[i];
      const bool leaf = count[i] > 0 || hit[i] == -1;
      if (leaf) {
        H[i] = e;
        M[i] = e;
        continue;
      }
      const float ex = maxs[3 * i] - mins[3 * i];
      const float ey = maxs[3 * i + 1] - mins[3 * i + 1];
      const float ez = maxs[3 * i + 2] - mins[3 * i + 2];
      int axis;  // strict comparisons, z on ties (matches the builder)
      if (ex > ey && ex > ez) axis = 0;
      else if (ey > ex && ey > ez) axis = 1;
      else axis = 2;
      const bool negd = (o >> axis) & 1;
      const int32_t left = static_cast<int32_t>(i) + 1;
      const int32_t right = miss[left];
      const int32_t near_c = negd ? right : left;
      const int32_t far_c = negd ? left : right;
      H[i] = near_c;
      M[i] = e;
      escape[near_c] = far_c;
      escape[far_c] = e;
    }
  }
}

}  // extern "C"
