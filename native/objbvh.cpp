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

// ---------------------------------------------------------------------------
// Binned-SAH build (16 centroid bins along the largest centroid-extent
// axis).  Produces the same threaded flat form as the median builder; tree
// QUALITY differs (fewer node visits per ray), hit RESULTS are identical
// by construction (closest-hit search is exact for any valid tree).
// Leaves hold at most 5 prims (LEAF_MAX in scene/bvh.py) so the traversal
// loop's unrolled leaf tests stay valid.
// ---------------------------------------------------------------------------

struct SahBuilder {
  static constexpr int kBins = 16;
  static constexpr int kLeafMax = 5;
  const float* aabb_min;   // [n,3]
  const float* aabb_max;
  std::vector<float> cent;  // [n,3] centroids (x2; only compared/binned)
  BvhOut out;

  static float half_area(const float mn[3], const float mx[3]) {
    const float ex = mx[0] - mn[0], ey = mx[1] - mn[1], ez = mx[2] - mn[2];
    return ex * ey + ey * ez + ez * ex;
  }

  int emit(std::vector<int32_t>& idx, size_t lo, size_t hi, int32_t escape,
           int depth) {
    const size_t node = out.hit.size();
    float mn[3] = {1e30f, 1e30f, 1e30f}, mx[3] = {-1e30f, -1e30f, -1e30f};
    float cmn[3] = {1e30f, 1e30f, 1e30f}, cmx[3] = {-1e30f, -1e30f, -1e30f};
    for (size_t i = lo; i < hi; ++i) {
      const int32_t p = idx[i];
      for (int a = 0; a < 3; ++a) {
        mn[a] = std::min(mn[a], aabb_min[3 * p + a]);
        mx[a] = std::max(mx[a], aabb_max[3 * p + a]);
        cmn[a] = std::min(cmn[a], cent[3 * p + a]);
        cmx[a] = std::max(cmx[a], cent[3 * p + a]);
      }
    }
    out.mins.insert(out.mins.end(), mn, mn + 3);
    out.maxs.insert(out.maxs.end(), mx, mx + 3);
    out.hit.push_back(0);
    out.miss.push_back(escape);
    out.first.push_back(-1);
    out.count.push_back(0);

    const size_t n = hi - lo;
    auto make_leaf = [&]() {
      out.first[node] = static_cast<int32_t>(out.order.size());
      out.count[node] = static_cast<int32_t>(n);
      out.order.insert(out.order.end(), idx.begin() + lo, idx.begin() + hi);
      out.hit[node] = escape;
      return depth;
    };
    if (n <= 2) return make_leaf();

    int axis = 0;
    float ext = -1.0f;
    for (int a = 0; a < 3; ++a) {
      const float e = cmx[a] - cmn[a];
      if (e > ext) { ext = e; axis = a; }
    }

    size_t mid;
    if (ext <= 0.0f) {
      // all centroids coincide: SAH cannot separate, median split unless
      // a small leaf is allowed
      if (n <= kLeafMax) return make_leaf();
      mid = lo + n / 2;
    } else {
      // bin along the chosen axis
      const float inv = static_cast<float>(kBins) / ext;
      int32_t bc[kBins] = {0};
      float bmn[kBins][3], bmx[kBins][3];
      for (int b = 0; b < kBins; ++b)
        for (int a = 0; a < 3; ++a) { bmn[b][a] = 1e30f; bmx[b][a] = -1e30f; }
      auto bin_of = [&](int32_t p) {
        int b = static_cast<int>((cent[3 * p + axis] - cmn[axis]) * inv);
        return b < 0 ? 0 : (b >= kBins ? kBins - 1 : b);
      };
      for (size_t i = lo; i < hi; ++i) {
        const int32_t p = idx[i];
        const int b = bin_of(p);
        ++bc[b];
        for (int a = 0; a < 3; ++a) {
          bmn[b][a] = std::min(bmn[b][a], aabb_min[3 * p + a]);
          bmx[b][a] = std::max(bmx[b][a], aabb_max[3 * p + a]);
        }
      }
      // suffix sweep: area/count of bins [k, kBins)
      float rarea[kBins + 1];
      int32_t rcount[kBins + 1];
      {
        float amn[3] = {1e30f, 1e30f, 1e30f}, amx[3] = {-1e30f, -1e30f, -1e30f};
        rarea[kBins] = 0.0f;
        rcount[kBins] = 0;
        for (int k = kBins - 1; k >= 0; --k) {
          for (int a = 0; a < 3; ++a) {
            amn[a] = std::min(amn[a], bmn[k][a]);
            amx[a] = std::max(amx[a], bmx[k][a]);
          }
          rcount[k] = rcount[k + 1] + bc[k];
          rarea[k] = rcount[k] ? half_area(amn, amx) : 0.0f;
        }
      }
      // prefix sweep: pick the split k (left bins [0,k)) minimizing SAH
      float best_cost = 1e30f;
      int best_k = -1;
      {
        float amn[3] = {1e30f, 1e30f, 1e30f}, amx[3] = {-1e30f, -1e30f, -1e30f};
        int32_t lcount = 0;
        for (int k = 1; k < kBins; ++k) {
          for (int a = 0; a < 3; ++a) {
            amn[a] = std::min(amn[a], bmn[k - 1][a]);
            amx[a] = std::max(amx[a], bmx[k - 1][a]);
          }
          lcount += bc[k - 1];
          if (lcount == 0 || rcount[k] == 0) continue;
          const float cost =
              lcount * half_area(amn, amx) + rcount[k] * rarea[k];
          if (cost < best_cost) { best_cost = cost; best_k = k; }
        }
      }
      const float leaf_cost = static_cast<float>(n) * half_area(mn, mx);
      if (best_k < 0 || (n <= kLeafMax && best_cost >= leaf_cost))
        return n <= kLeafMax ? make_leaf()
                             : (mid = lo + n / 2,
                                std::stable_sort(
                                    idx.begin() + lo, idx.begin() + hi,
                                    [&](int32_t a, int32_t b) {
                                      return cent[3 * a + axis] <
                                             cent[3 * b + axis];
                                    }),
                                split(idx, lo, mid, hi, escape, depth, node));
      // stable partition by bin id keeps deterministic ordering
      std::stable_partition(idx.begin() + lo, idx.begin() + hi,
                            [&](int32_t p) { return bin_of(p) < best_k; });
      size_t nl = 0;
      for (size_t i = lo; i < hi; ++i)
        if (bin_of(idx[i]) < best_k) ++nl; else break;
      mid = lo + nl;
      if (mid == lo || mid == hi) mid = lo + n / 2;  // numeric edge guard
    }
    return split(idx, lo, mid, hi, escape, depth, node);
  }

  int split(std::vector<int32_t>& idx, size_t lo, size_t mid, size_t hi,
            int32_t escape, int depth, size_t node) {
    out.hit[node] = static_cast<int32_t>(node + 1);
    const int d1 = emit(idx, lo, mid, -2, depth + 1);
    const int32_t right = static_cast<int32_t>(out.hit.size());
    for (size_t j = node + 1; j < out.hit.size(); ++j) {
      if (out.miss[j] == -2) out.miss[j] = right;
      if (out.first[j] >= 0 && out.hit[j] == -2) out.hit[j] = right;
    }
    const int d2 = emit(idx, mid, hi, escape, depth + 1);
    return std::max(d1, d2);
  }
};

void* bvh_build_sah(int64_t n, const float* aabb_min, const float* aabb_max) {
  auto* b = new SahBuilder{};
  b->aabb_min = aabb_min;
  b->aabb_max = aabb_max;
  if (n > 0) {
    b->cent.resize(3 * n);
    for (int64_t i = 0; i < 3 * n; ++i) b->cent[i] = aabb_min[i] + aabb_max[i];
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

int64_t sah_num_nodes(void* h) { return static_cast<SahBuilder*>(h)->out.hit.size(); }
int32_t sah_depth(void* h) { return static_cast<SahBuilder*>(h)->out.depth; }

void sah_copy(void* h, float* mins, float* maxs, int32_t* hit, int32_t* miss,
              int32_t* first, int32_t* count, int32_t* order) {
  auto& o = static_cast<SahBuilder*>(h)->out;
  memcpy(mins, o.mins.data(), o.mins.size() * sizeof(float));
  memcpy(maxs, o.maxs.data(), o.maxs.size() * sizeof(float));
  memcpy(hit, o.hit.data(), o.hit.size() * sizeof(int32_t));
  memcpy(miss, o.miss.data(), o.miss.size() * sizeof(int32_t));
  memcpy(first, o.first.data(), o.first.size() * sizeof(int32_t));
  memcpy(count, o.count.data(), o.count.size() * sizeof(int32_t));
  memcpy(order, o.order.data(), o.order.size() * sizeof(int32_t));
}

void sah_free(void* h) { delete static_cast<SahBuilder*>(h); }

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
      const int32_t left = static_cast<int32_t>(i) + 1;
      const int32_t right = miss[left];
      // axis of largest child-centroid separation (first max on ties,
      // matching numpy argmax in the Python fallback)
      float best = -1.0f;
      int axis = 0;
      float diff_axis = 0.0f;
      for (int a = 0; a < 3; ++a) {
        const float cl = mins[3 * left + a] + maxs[3 * left + a];
        const float cr = mins[3 * right + a] + maxs[3 * right + a];
        const float d = cr - cl;
        const float ad = d < 0 ? -d : d;
        if (ad > best) {
          best = ad;
          axis = a;
          diff_axis = d;
        }
      }
      const bool negd = (o >> axis) & 1;
      const bool left_near = (diff_axis >= 0.0f) != negd;
      const int32_t near_c = left_near ? left : right;
      const int32_t far_c = left_near ? right : left;
      H[i] = near_c;
      M[i] = e;
      escape[near_c] = far_c;
      escape[far_c] = e;
    }
  }
}

}  // extern "C"
