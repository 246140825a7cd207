// Mesh signed-distance queries: BVH closest-point + angle-weighted
// pseudonormal sign (Baerentzen & Aanaes 2005).
//
// Native host-side replacement for the reference's `pysdf` dependency
// (sdf/provider.py:7, :52) used to generate SDF training labels. Built
// as a shared library and bound via ctypes (ngp_tpu/native/build.py).
//
// API (extern "C"):
//   sdf_build(verts[nv*3], nv, tris[nt*3], nt) -> opaque handle
//   sdf_query(handle, pts[n*3], n, out[n])     -> signed distances
//                                                 (positive outside)
//   sdf_free(handle)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vsub(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static inline Vec3 vadd(Vec3 a, Vec3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static inline Vec3 vscale(Vec3 a, float s) { return {a.x * s, a.y * s, a.z * s}; }
static inline float vdot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static inline Vec3 vcross(Vec3 a, Vec3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline float vlen(Vec3 a) { return std::sqrt(vdot(a, a)); }
static inline Vec3 vnorm(Vec3 a) {
  float l = vlen(a);
  return l > 0 ? vscale(a, 1.0f / l) : Vec3{0, 0, 0};
}

// Closest point on triangle abc to p (Ericson, Real-Time Collision
// Detection §5.1.5). Also reports the feature region: 0=face,
// 1/2/3=vertex a/b/c, 4/5/6=edge ab/bc/ca.
static Vec3 closest_on_triangle(Vec3 p, Vec3 a, Vec3 b, Vec3 c, int* region) {
  Vec3 ab = vsub(b, a), ac = vsub(c, a), ap = vsub(p, a);
  float d1 = vdot(ab, ap), d2 = vdot(ac, ap);
  if (d1 <= 0 && d2 <= 0) { *region = 1; return a; }
  Vec3 bp = vsub(p, b);
  float d3 = vdot(ab, bp), d4 = vdot(ac, bp);
  if (d3 >= 0 && d4 <= d3) { *region = 2; return b; }
  float vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    float v = d1 / (d1 - d3);
    *region = 4;
    return vadd(a, vscale(ab, v));
  }
  Vec3 cp = vsub(p, c);
  float d5 = vdot(ab, cp), d6 = vdot(ac, cp);
  if (d6 >= 0 && d5 <= d6) { *region = 3; return c; }
  float vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    float w = d2 / (d2 - d6);
    *region = 6;
    return vadd(a, vscale(ac, w));
  }
  float va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    float w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    *region = 5;
    return vadd(b, vscale(vsub(c, b), w));
  }
  float denom = 1.0f / (va + vb + vc);
  float v = vb * denom, w = vc * denom;
  *region = 0;
  return vadd(a, vadd(vscale(ab, v), vscale(ac, w)));
}

struct AABB {
  Vec3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
  void grow(Vec3 p) {
    lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y); lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y); hi.z = std::max(hi.z, p.z);
  }
  void grow(const AABB& b) { grow(b.lo); grow(b.hi); }
  float dist2(Vec3 p) const {
    float dx = std::max({lo.x - p.x, 0.0f, p.x - hi.x});
    float dy = std::max({lo.y - p.y, 0.0f, p.y - hi.y});
    float dz = std::max({lo.z - p.z, 0.0f, p.z - hi.z});
    return dx * dx + dy * dy + dz * dz;
  }
};

struct BVHNode {
  AABB box;
  int left = -1, right = -1;  // internal: children; leaf: -1
  int start = 0, count = 0;   // leaf triangle range
};

struct SDFMesh {
  std::vector<Vec3> verts;
  std::vector<int> tris;            // nt*3
  std::vector<int> tri_order;       // BVH leaf ordering
  std::vector<BVHNode> nodes;
  std::vector<Vec3> face_normals;   // per tri (normalized)
  std::vector<Vec3> vert_normals;   // angle-weighted pseudonormals
  // edge pseudonormals keyed by sorted (v0, v1)
  std::vector<std::pair<uint64_t, Vec3>> edge_normals;  // sorted for lookup

  Vec3 v(int i) const { return verts[i]; }
  Vec3 tv(int t, int k) const { return verts[tris[3 * t + k]]; }
};

static int build_node(SDFMesh& m, std::vector<int>& idx, std::vector<Vec3>& cent,
                      int start, int count) {
  int ni = (int)m.nodes.size();
  m.nodes.push_back({});
  AABB box;
  for (int i = start; i < start + count; ++i) {
    int t = idx[i];
    box.grow(m.tv(t, 0)); box.grow(m.tv(t, 1)); box.grow(m.tv(t, 2));
  }
  m.nodes[ni].box = box;
  if (count <= 4) {
    m.nodes[ni].start = start;
    m.nodes[ni].count = count;
    return ni;
  }
  // split on largest centroid-extent axis at the median
  AABB cbox;
  for (int i = start; i < start + count; ++i) cbox.grow(cent[idx[i]]);
  Vec3 ext = vsub(cbox.hi, cbox.lo);
  int axis = (ext.x > ext.y && ext.x > ext.z) ? 0 : (ext.y > ext.z ? 1 : 2);
  int mid = start + count / 2;
  std::nth_element(idx.begin() + start, idx.begin() + mid, idx.begin() + start + count,
                   [&](int a, int b) {
                     const float* pa = &cent[a].x;
                     const float* pb = &cent[b].x;
                     return pa[axis] < pb[axis];
                   });
  int l = build_node(m, idx, cent, start, mid - start);
  int r = build_node(m, idx, cent, mid, start + count - mid);
  m.nodes[ni].left = l;
  m.nodes[ni].right = r;
  return ni;
}

static uint64_t edge_key(int a, int b) {
  if (a > b) std::swap(a, b);
  return ((uint64_t)a << 32) | (uint32_t)b;
}

}  // namespace

extern "C" {

void* sdf_build(const float* verts, int nv, const int* tris, int nt) {
  auto* m = new SDFMesh();
  m->verts.resize(nv);
  std::memcpy(m->verts.data(), verts, sizeof(float) * 3 * nv);
  m->tris.assign(tris, tris + 3 * nt);

  // normals
  m->face_normals.resize(nt);
  m->vert_normals.assign(nv, {0, 0, 0});
  std::vector<std::pair<uint64_t, Vec3>> edges;
  edges.reserve(3 * nt);
  for (int t = 0; t < nt; ++t) {
    Vec3 a = m->tv(t, 0), b = m->tv(t, 1), c = m->tv(t, 2);
    Vec3 n = vnorm(vcross(vsub(b, a), vsub(c, a)));
    m->face_normals[t] = n;
    // angle-weighted vertex normals
    for (int k = 0; k < 3; ++k) {
      Vec3 p = m->tv(t, k), q = m->tv(t, (k + 1) % 3), r = m->tv(t, (k + 2) % 3);
      Vec3 e1 = vnorm(vsub(q, p)), e2 = vnorm(vsub(r, p));
      float ang = std::acos(std::min(1.0f, std::max(-1.0f, vdot(e1, e2))));
      m->vert_normals[m->tris[3 * t + k]] =
          vadd(m->vert_normals[m->tris[3 * t + k]], vscale(n, ang));
    }
    for (int k = 0; k < 3; ++k) {
      edges.emplace_back(edge_key(m->tris[3 * t + k], m->tris[3 * t + (k + 1) % 3]), n);
    }
  }
  for (auto& vn : m->vert_normals) vn = vnorm(vn);
  std::sort(edges.begin(), edges.end(),
            [](const auto& a, const auto& b) { return a.first < b.first; });
  // sum normals of faces sharing each edge
  m->edge_normals.reserve(edges.size() / 2 + 1);
  for (size_t i = 0; i < edges.size();) {
    size_t j = i;
    Vec3 s{0, 0, 0};
    while (j < edges.size() && edges[j].first == edges[i].first) {
      s = vadd(s, edges[j].second);
      ++j;
    }
    m->edge_normals.emplace_back(edges[i].first, vnorm(s));
    i = j;
  }

  // BVH
  std::vector<Vec3> cent(nt);
  for (int t = 0; t < nt; ++t) {
    Vec3 a = m->tv(t, 0), b = m->tv(t, 1), c = m->tv(t, 2);
    cent[t] = vscale(vadd(a, vadd(b, c)), 1.0f / 3.0f);
  }
  m->tri_order.resize(nt);
  for (int t = 0; t < nt; ++t) m->tri_order[t] = t;
  m->nodes.reserve(2 * nt);
  build_node(*m, m->tri_order, cent, 0, nt);
  return m;
}

void sdf_query(void* handle, const float* pts, int n, float* out) {
  const auto* m = static_cast<const SDFMesh*>(handle);

#pragma omp parallel for schedule(dynamic, 256)
  for (int i = 0; i < n; ++i) {
    Vec3 p{pts[3 * i], pts[3 * i + 1], pts[3 * i + 2]};
    float best_d2 = 1e30f;
    Vec3 best_cp{0, 0, 0};
    int best_tri = -1, best_region = 0;

    int stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      int ni = stack[--sp];
      const BVHNode& node = m->nodes[ni];
      if (node.box.dist2(p) >= best_d2) continue;
      if (node.left < 0) {
        for (int k = node.start; k < node.start + node.count; ++k) {
          int t = m->tri_order[k];
          int region;
          Vec3 cp = closest_on_triangle(p, m->tv(t, 0), m->tv(t, 1), m->tv(t, 2), &region);
          Vec3 d = vsub(p, cp);
          float d2 = vdot(d, d);
          if (d2 < best_d2) {
            best_d2 = d2;
            best_cp = cp;
            best_tri = t;
            best_region = region;
          }
        }
      } else {
        // visit nearer child first
        float dl = m->nodes[node.left].box.dist2(p);
        float dr = m->nodes[node.right].box.dist2(p);
        if (dl < dr) {
          if (dr < best_d2) stack[sp++] = node.right;
          if (dl < best_d2) stack[sp++] = node.left;
        } else {
          if (dl < best_d2) stack[sp++] = node.left;
          if (dr < best_d2) stack[sp++] = node.right;
        }
      }
    }

    // sign from the pseudonormal of the closest feature
    Vec3 nrm = m->face_normals[best_tri];
    if (best_region >= 1 && best_region <= 3) {
      nrm = m->vert_normals[m->tris[3 * best_tri + (best_region - 1)]];
    } else if (best_region >= 4) {
      int k = best_region - 4;  // edge ab/bc/ca
      uint64_t key = edge_key(m->tris[3 * best_tri + k], m->tris[3 * best_tri + (k + 1) % 3]);
      auto it = std::lower_bound(
          m->edge_normals.begin(), m->edge_normals.end(), key,
          [](const auto& a, uint64_t b) { return a.first < b; });
      if (it != m->edge_normals.end() && it->first == key) nrm = it->second;
    }
    Vec3 d = vsub(p, best_cp);
    float dist = std::sqrt(best_d2);
    out[i] = (vdot(d, nrm) >= 0 ? 1.0f : -1.0f) * dist;
  }
}

void sdf_free(void* handle) { delete static_cast<SDFMesh*>(handle); }

}  // extern "C"
