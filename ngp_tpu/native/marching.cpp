// Iso-surface extraction via marching tetrahedra.
//
// Native host-side replacement for the reference's `mcubes` dependency
// (nerf/utils.py:173-203 `extract_geometry`, sdf/utils.py:235-259
// `save_mesh`). Each grid cube is split into 6 tetrahedra; every tet
// case is enumerable without the 256-entry marching-cubes tables, and
// shared edge vertices are deduplicated through a hash map so the
// output is watertight. Bound via ctypes (ngp_tpu/native/build.py).
//
// API (extern "C"):
//   marching_tets(grid[nx*ny*nz] (x-major: idx = (x*ny + y)*nz + z),
//                 nx, ny, nz, iso,
//                 &out_verts, &out_nv, &out_tris, &out_nt)
//     vertices are in grid-index coordinates ([0, nx-1] etc.);
//     caller rescales. Returns 0 on success.
//   marching_free(verts, tris)

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// The 6-tet decomposition of a cube (corner ids 0..7, corner c has
// coords ((c>>0)&1, (c>>1)&1, (c>>2)&1)). All tets share the main
// diagonal 0-7, guaranteeing face-consistent triangulation between
// neighbouring cubes.
static const int TETS[6][4] = {
    {0, 5, 1, 7}, {0, 1, 3, 7}, {0, 3, 2, 7},
    {0, 2, 6, 7}, {0, 6, 4, 7}, {0, 4, 5, 7},
};

struct MeshOut {
  std::vector<float> verts;
  std::vector<int> tris;
  std::unordered_map<uint64_t, int> edge_vertex;
};

}  // namespace

extern "C" {

int marching_tets(const float* grid, int nx, int ny, int nz, float iso,
                  float** out_verts, int* out_nv, int** out_tris, int* out_nt) {
  MeshOut mesh;
  auto gid = [&](int x, int y, int z) -> int64_t {
    return ((int64_t)x * ny + y) * nz + z;
  };

  // interpolated vertex on edge (a, b); a/b are flat grid ids
  auto edge_vert = [&](int64_t a, int64_t b, float va, float vb) -> int {
    if (a > b) {
      std::swap(a, b);
      std::swap(va, vb);
    }
    uint64_t key = ((uint64_t)a << 32) | (uint64_t)b;
    auto it = mesh.edge_vertex.find(key);
    if (it != mesh.edge_vertex.end()) return it->second;
    float t = (iso - va) / (vb - va);
    if (!(t >= 0.0f && t <= 1.0f)) t = 0.5f;
    // decode flat ids back to coords
    int az = (int)(a % nz), ay = (int)((a / nz) % ny), ax = (int)(a / ((int64_t)ny * nz));
    int bz = (int)(b % nz), by = (int)((b / nz) % ny), bx = (int)(b / ((int64_t)ny * nz));
    int vi = (int)(mesh.verts.size() / 3);
    mesh.verts.push_back(ax + t * (bx - ax));
    mesh.verts.push_back(ay + t * (by - ay));
    mesh.verts.push_back(az + t * (bz - az));
    mesh.edge_vertex.emplace(key, vi);
    return vi;
  };

  for (int x = 0; x + 1 < nx; ++x) {
    for (int y = 0; y + 1 < ny; ++y) {
      for (int z = 0; z + 1 < nz; ++z) {
        int64_t cid[8];
        float cval[8];
        for (int c = 0; c < 8; ++c) {
          int cx = x + ((c >> 0) & 1), cy = y + ((c >> 1) & 1), cz = z + ((c >> 2) & 1);
          cid[c] = gid(cx, cy, cz);
          cval[c] = grid[cid[c]];
        }
        // skip cubes fully inside/outside
        bool any_in = false, any_out = false;
        for (int c = 0; c < 8; ++c) (cval[c] > iso ? any_in : any_out) = true;
        if (!any_in || !any_out) continue;

        for (const auto& tet : TETS) {
          int64_t id[4];
          float v[4];
          int mask = 0;
          for (int k = 0; k < 4; ++k) {
            id[k] = cid[tet[k]];
            v[k] = cval[tet[k]];
            if (v[k] > iso) mask |= 1 << k;
          }
          if (mask == 0 || mask == 15) continue;
          // canonicalize: ensure the "inside" set has 1 or 2 bits;
          // invert (and flip orientation) when 3 bits are inside.
          bool flip = false;
          int inside = mask;
          if (__builtin_popcount(mask) >= 3) {
            inside = (~mask) & 15;
            flip = true;
          }
          if (__builtin_popcount(inside) == 1) {
            int a = __builtin_ctz(inside);
            int o[3];
            int n = 0;
            for (int k = 0; k < 4; ++k)
              if (k != a) o[n++] = k;
            int v0 = edge_vert(id[a], id[o[0]], v[a], v[o[0]]);
            int v1 = edge_vert(id[a], id[o[1]], v[a], v[o[1]]);
            int v2 = edge_vert(id[a], id[o[2]], v[a], v[o[2]]);
            if (flip) std::swap(v1, v2);
            mesh.tris.push_back(v0);
            mesh.tris.push_back(v1);
            mesh.tris.push_back(v2);
          } else {  // two inside -> quad -> two triangles
            int a = -1, b = -1, c = -1, d = -1;
            for (int k = 0; k < 4; ++k) {
              if (inside & (1 << k)) (a < 0 ? a : b) = k;
              else (c < 0 ? c : d) = k;
            }
            int vac = edge_vert(id[a], id[c], v[a], v[c]);
            int vad = edge_vert(id[a], id[d], v[a], v[d]);
            int vbc = edge_vert(id[b], id[c], v[b], v[c]);
            int vbd = edge_vert(id[b], id[d], v[b], v[d]);
            if (flip) {
              mesh.tris.push_back(vac); mesh.tris.push_back(vad); mesh.tris.push_back(vbd);
              mesh.tris.push_back(vac); mesh.tris.push_back(vbd); mesh.tris.push_back(vbc);
            } else {
              mesh.tris.push_back(vac); mesh.tris.push_back(vbd); mesh.tris.push_back(vad);
              mesh.tris.push_back(vac); mesh.tris.push_back(vbc); mesh.tris.push_back(vbd);
            }
          }
        }
      }
    }
  }

  *out_nv = (int)(mesh.verts.size() / 3);
  *out_nt = (int)(mesh.tris.size() / 3);
  *out_verts = (float*)std::malloc(mesh.verts.size() * sizeof(float));
  *out_tris = (int*)std::malloc(mesh.tris.size() * sizeof(int));
  std::memcpy(*out_verts, mesh.verts.data(), mesh.verts.size() * sizeof(float));
  std::memcpy(*out_tris, mesh.tris.data(), mesh.tris.size() * sizeof(int));
  return 0;
}

void marching_free(float* verts, int* tris) {
  std::free(verts);
  std::free(tris);
}

}  // extern "C"
