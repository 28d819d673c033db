// Native scene ray-tracer for the synthetic data pipeline.
//
// The reference's data generator is Blender/Cycles (C++ renderer driven from
// Python — ref data_generator/, src/rd/); our procedural stand-in traces
// sphere/box/plane primitives. This is the host-side hot loop of dataset
// generation (24+ views x H*W rays per scene), so it is implemented natively
// with OpenMP and exposed via a C ABI consumed through ctypes
// (graspnerf_tpu/data/native.py). The numpy implementation in
// data/synthetic.py remains the correctness oracle (tests/test_native.py).
//
// Build: see native/build.sh (g++ -O3 -march=native -fopenmp -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 sub(Vec3 a, Vec3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline float dot(Vec3 a, Vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

}  // namespace

extern "C" {

// spheres: [ns,4] (cx,cy,cz,r); boxes: [nb,6] (lox,loy,loz,hix,hiy,hiz)
// origins/dirs: [n,3] (dirs unit). Outputs: t [n] (inf -> miss encoded as
// 1e30), normal [n,3], obj_id [n] (-1 miss; spheres first, then boxes, then
// table plane z=0 with id ns+nb). Matches Scene.trace in data/synthetic.py.
void trace_rays(const float* spheres, int ns, const float* boxes, int nb,
                const float* origins, const float* dirs, int n,
                float* out_t, float* out_n, int32_t* out_id) {
  const float INF = 1e30f;
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    Vec3 o{origins[3 * i], origins[3 * i + 1], origins[3 * i + 2]};
    Vec3 d{dirs[3 * i], dirs[3 * i + 1], dirs[3 * i + 2]};
    float best_t = INF;
    Vec3 best_n{0.f, 0.f, 0.f};
    int best_id = -1;

    for (int s = 0; s < ns; ++s) {
      Vec3 c{spheres[4 * s], spheres[4 * s + 1], spheres[4 * s + 2]};
      float r = spheres[4 * s + 3];
      Vec3 oc = sub(o, c);
      float b = dot(d, oc);
      float disc = b * b - (dot(oc, oc) - r * r);
      if (disc <= 0.f) continue;
      float t = -b - std::sqrt(disc);
      if (t > 1e-4f && t < best_t) {
        best_t = t;
        Vec3 p{o.x + d.x * t, o.y + d.y * t, o.z + d.z * t};
        best_n = {(p.x - c.x) / r, (p.y - c.y) / r, (p.z - c.z) / r};
        best_id = s;
      }
    }

    for (int bi = 0; bi < nb; ++bi) {
      const float* lo = boxes + 6 * bi;
      const float* hi = lo + 3;
      float tn = -INF, tf = INF;
      int axis = 0;
      float sign = 0.f;
      const float od[3] = {o.x, o.y, o.z};
      const float dd[3] = {d.x, d.y, d.z};
      bool ok = true;
      for (int a = 0; a < 3; ++a) {
        float inv = 1.0f / (std::fabs(dd[a]) < 1e-9f
                                ? (dd[a] < 0 ? -1e-9f : 1e-9f)
                                : dd[a]);
        float t0 = (lo[a] - od[a]) * inv;
        float t1 = (hi[a] - od[a]) * inv;
        float tmin = t0 < t1 ? t0 : t1;
        float tmax = t0 < t1 ? t1 : t0;
        if (tmin > tn) {
          tn = tmin;
          axis = a;
          sign = dd[a] > 0 ? -1.f : 1.f;
        }
        if (tmax < tf) tf = tmax;
        if (tn >= tf || tf <= 0) { ok = false; break; }
      }
      if (!ok) continue;
      if (tn > 1e-4f && tn < best_t) {
        best_t = tn;
        best_n = {0.f, 0.f, 0.f};
        if (axis == 0) best_n.x = sign;
        if (axis == 1) best_n.y = sign;
        if (axis == 2) best_n.z = sign;
        best_id = ns + bi;
      }
    }

    // table plane z = 0
    if (std::fabs(d.z) > 1e-9f) {
      float t = -o.z / d.z;
      if (t > 1e-4f && t < best_t) {
        best_t = t;
        best_n = {0.f, 0.f, 1.f};
        best_id = ns + nb;
      }
    }

    out_t[i] = best_t;
    out_n[3 * i] = best_n.x;
    out_n[3 * i + 1] = best_n.y;
    out_n[3 * i + 2] = best_n.z;
    out_id[i] = best_id;
  }
}

// Oriented-primitive tracer for the simulation harness
// (graspnerf_tpu/sim/objects.py). prims: [np,16] rows of
// [kind, R row-major(9), t(3), params(3)] with world = R*local + t.
// kinds: 0 sphere(r) / 1 box(hx,hy,hz) / 2 capped cylinder(r,hz) /
// 3 capsule(r,hz), all axis = local z. with_table adds the plane z=0 with
// id = np_. Misses -> t=1e30, id=-1. Mirrors PrimScene.trace (the numpy
// correctness oracle, tests/test_sim_objects.py).
void trace_prims(const float* prims, int np_, const float* origins,
                 const float* dirs, int n, int with_table, float* out_t,
                 float* out_n, int32_t* out_id) {
  const float INF = 1e30f;
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    Vec3 wo{origins[3 * i], origins[3 * i + 1], origins[3 * i + 2]};
    Vec3 wd{dirs[3 * i], dirs[3 * i + 1], dirs[3 * i + 2]};
    float best_t = INF;
    Vec3 best_n{0.f, 0.f, 0.f};
    int best_id = -1;

    for (int pi = 0; pi < np_; ++pi) {
      const float* P = prims + 16 * pi;
      int kind = (int)P[0];
      const float* R = P + 1;   // row-major 3x3
      Vec3 tr{P[10], P[11], P[12]};
      float p0 = P[13], p1 = P[14];
      // local = R^T * (world - t)
      Vec3 rel = sub(wo, tr);
      Vec3 o{R[0] * rel.x + R[3] * rel.y + R[6] * rel.z,
             R[1] * rel.x + R[4] * rel.y + R[7] * rel.z,
             R[2] * rel.x + R[5] * rel.y + R[8] * rel.z};
      Vec3 d{R[0] * wd.x + R[3] * wd.y + R[6] * wd.z,
             R[1] * wd.x + R[4] * wd.y + R[7] * wd.z,
             R[2] * wd.x + R[5] * wd.y + R[8] * wd.z};
      float t_hit = INF;
      Vec3 n_hit{0.f, 0.f, 0.f};

      if (kind == 0 || kind == 3) {  // sphere / capsule end-spheres
        float r = p0;
        int ncap = kind == 0 ? 1 : 2;
        for (int ci = 0; ci < ncap; ++ci) {
          float cz = kind == 0 ? 0.f : (ci == 0 ? -p1 : p1);
          Vec3 oc{o.x, o.y, o.z - cz};
          float b = dot(d, oc);
          float disc = b * b - (dot(oc, oc) - r * r);
          if (disc <= 0.f) continue;
          float t = -b - std::sqrt(disc);
          if (t <= 1e-5f || t >= t_hit) continue;
          float pz = o.z + t * d.z;
          if (kind == 3 && !(ci == 0 ? pz <= -p1 : pz >= p1)) continue;
          t_hit = t;
          n_hit = {(o.x + t * d.x) / r, (o.y + t * d.y) / r, (pz - cz) / r};
        }
      }
      if (kind == 2 || kind == 3) {  // cylinder side (+caps for kind 2)
        float r = p0, hz = p1;
        float a = d.x * d.x + d.y * d.y;
        float b = o.x * d.x + o.y * d.y;
        float c = o.x * o.x + o.y * o.y - r * r;
        float disc = b * b - a * c;
        if (disc > 0.f && a > 1e-9f) {
          float t = (-b - std::sqrt(disc)) / a;
          float pz = o.z + t * d.z;
          if (t > 1e-5f && t < t_hit && std::fabs(pz) <= hz) {
            t_hit = t;
            n_hit = {(o.x + t * d.x) / r, (o.y + t * d.y) / r, 0.f};
          }
        }
        if (kind == 2 && std::fabs(d.z) > 1e-9f) {
          for (int ci = 0; ci < 2; ++ci) {
            float zc = ci == 0 ? -hz : hz;
            float t = (zc - o.z) / d.z;
            if (t <= 1e-5f || t >= t_hit) continue;
            float px = o.x + t * d.x, py = o.y + t * d.y;
            if (px * px + py * py > r * r) continue;
            t_hit = t;
            n_hit = {0.f, 0.f, ci == 0 ? -1.f : 1.f};
          }
        }
      }
      if (kind == 1) {  // box (half-extents)
        const float h[3] = {P[13], P[14], P[15]};
        const float od[3] = {o.x, o.y, o.z};
        const float dd[3] = {d.x, d.y, d.z};
        float tn = -INF, tf = INF;
        int axis = 0;
        float sign = 0.f;
        bool ok = true;
        for (int a = 0; a < 3; ++a) {
          float inv = 1.0f / (std::fabs(dd[a]) < 1e-9f
                                  ? (dd[a] < 0 ? -1e-9f : 1e-9f)
                                  : dd[a]);
          float t0 = (-h[a] - od[a]) * inv;
          float t1 = (h[a] - od[a]) * inv;
          float tmin = t0 < t1 ? t0 : t1;
          float tmax = t0 < t1 ? t1 : t0;
          if (tmin > tn) {
            tn = tmin;
            axis = a;
            sign = dd[a] > 0 ? -1.f : 1.f;
          }
          if (tmax < tf) tf = tmax;
          if (tn >= tf || tf <= 0) { ok = false; break; }
        }
        if (ok && tn > 1e-5f && tn < t_hit) {
          t_hit = tn;
          n_hit = {0.f, 0.f, 0.f};
          if (axis == 0) n_hit.x = sign;
          if (axis == 1) n_hit.y = sign;
          if (axis == 2) n_hit.z = sign;
        }
      }

      if (t_hit < best_t) {
        best_t = t_hit;
        // world normal = R * local normal
        best_n = {R[0] * n_hit.x + R[1] * n_hit.y + R[2] * n_hit.z,
                  R[3] * n_hit.x + R[4] * n_hit.y + R[5] * n_hit.z,
                  R[6] * n_hit.x + R[7] * n_hit.y + R[8] * n_hit.z};
        best_id = pi;
      }
    }

    if (with_table && std::fabs(wd.z) > 1e-9f) {
      float t = -wo.z / wd.z;
      if (t > 1e-5f && t < best_t) {
        best_t = t;
        best_n = {0.f, 0.f, 1.f};
        best_id = np_;
      }
    }

    out_t[i] = best_t;
    out_n[3 * i] = best_n.x;
    out_n[3 * i + 1] = best_n.y;
    out_n[3 * i + 2] = best_n.z;
    out_id[i] = best_id;
  }
}

// Triangle-mesh tracer with a median-split BVH, for MeshObject scenes
// (graspnerf_tpu/sim/mesh.py is the numpy Moller-Trumbore oracle).
// tris: [nt,9] world-space (v0,v1,v2); tri_ids: [nt] object id per triangle.
// Outputs as trace_prims (miss -> t=1e30, id=-1). Normals are geometric,
// oriented against the ray.
void trace_tris(const float* tris, const int32_t* tri_ids, int nt,
                const float* origins, const float* dirs, int n,
                float* out_t, float* out_n, int32_t* out_id) {
  const float INF = 1e30f;
  struct Node {
    float lo[3], hi[3];
    int left, right;    // children (internal) or -1
    int start, count;   // leaf triangle range
  };
  // build: median split on the largest centroid axis
  int* order = new int[nt];
  float* cent = new float[3 * nt];
  for (int i = 0; i < nt; ++i) {
    order[i] = i;
    const float* T = tris + 9 * i;
    for (int a = 0; a < 3; ++a)
      cent[3 * i + a] = (T[a] + T[3 + a] + T[6 + a]) / 3.0f;
  }
  Node* nodes = new Node[2 * nt + 2];
  int n_nodes = 0;
  // explicit stack of (start, count, parent_slot)
  struct Task { int start, count, slot; };
  Task* stack = new Task[2 * nt + 2];
  int sp = 0;
  stack[sp++] = {0, nt, 0};
  n_nodes = 1;
  while (sp > 0) {
    Task tk = stack[--sp];
    Node& nd = nodes[tk.slot];
    for (int a = 0; a < 3; ++a) { nd.lo[a] = INF; nd.hi[a] = -INF; }
    for (int k = tk.start; k < tk.start + tk.count; ++k) {
      const float* T = tris + 9 * order[k];
      for (int v = 0; v < 3; ++v)
        for (int a = 0; a < 3; ++a) {
          float x = T[3 * v + a];
          if (x < nd.lo[a]) nd.lo[a] = x;
          if (x > nd.hi[a]) nd.hi[a] = x;
        }
    }
    if (tk.count <= 4) {
      nd.left = nd.right = -1;
      nd.start = tk.start;
      nd.count = tk.count;
      continue;
    }
    int axis = 0;
    float ext = nd.hi[0] - nd.lo[0];
    for (int a = 1; a < 3; ++a)
      if (nd.hi[a] - nd.lo[a] > ext) { ext = nd.hi[a] - nd.lo[a]; axis = a; }
    // median split via nth_element-style partition (simple sort of range)
    int mid = tk.count / 2;
    // partial selection sort is O(n^2) worst; use std::nth_element
    std::nth_element(order + tk.start, order + tk.start + mid,
                     order + tk.start + tk.count,
                     [cent, axis](int a, int b) {
                       return cent[3 * a + axis] < cent[3 * b + axis];
                     });
    nd.left = n_nodes++;
    nd.right = n_nodes++;
    nd.start = -1;
    nd.count = 0;
    stack[sp++] = {tk.start, mid, nd.left};
    stack[sp++] = {tk.start + mid, tk.count - mid, nd.right};
  }

#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    Vec3 o{origins[3 * i], origins[3 * i + 1], origins[3 * i + 2]};
    Vec3 d{dirs[3 * i], dirs[3 * i + 1], dirs[3 * i + 2]};
    float inv[3] = {
        1.0f / (std::fabs(d.x) < 1e-12f ? (d.x < 0 ? -1e-12f : 1e-12f) : d.x),
        1.0f / (std::fabs(d.y) < 1e-12f ? (d.y < 0 ? -1e-12f : 1e-12f) : d.y),
        1.0f / (std::fabs(d.z) < 1e-12f ? (d.z < 0 ? -1e-12f : 1e-12f) : d.z)};
    const float od[3] = {o.x, o.y, o.z};
    float best_t = INF;
    Vec3 best_n{0.f, 0.f, 0.f};
    int best_id = -1;
    int tstack[128];
    int tsp = 0;
    tstack[tsp++] = 0;
    while (tsp > 0) {
      const Node& nd = nodes[tstack[--tsp]];
      // slab test
      float tn = 0.0f, tf = best_t;
      bool ok = true;
      for (int a = 0; a < 3; ++a) {
        float t0 = (nd.lo[a] - od[a]) * inv[a];
        float t1 = (nd.hi[a] - od[a]) * inv[a];
        if (t0 > t1) { float tmp = t0; t0 = t1; t1 = tmp; }
        if (t0 > tn) tn = t0;
        if (t1 < tf) tf = t1;
        if (tn > tf) { ok = false; break; }
      }
      if (!ok) continue;
      if (nd.left >= 0) {
        if (tsp + 2 <= 128) {
          tstack[tsp++] = nd.left;
          tstack[tsp++] = nd.right;
        }
        continue;
      }
      for (int k = nd.start; k < nd.start + nd.count; ++k) {
        int ti = order[k];
        const float* T = tris + 9 * ti;
        Vec3 v0{T[0], T[1], T[2]};
        Vec3 e1{T[3] - T[0], T[4] - T[1], T[5] - T[2]};
        Vec3 e2{T[6] - T[0], T[7] - T[1], T[8] - T[2]};
        // Moller-Trumbore
        Vec3 h{d.y * e2.z - d.z * e2.y, d.z * e2.x - d.x * e2.z,
               d.x * e2.y - d.y * e2.x};
        float a = dot(e1, h);
        if (std::fabs(a) < 1e-9f) continue;
        float f = 1.0f / a;
        Vec3 s = sub(o, v0);
        float u = f * dot(s, h);
        if (u < -1e-7f || u > 1.0f + 1e-7f) continue;
        Vec3 q{s.y * e1.z - s.z * e1.y, s.z * e1.x - s.x * e1.z,
               s.x * e1.y - s.y * e1.x};
        float v = f * dot(d, q);
        if (v < -1e-7f || u + v > 1.0f + 1e-7f) continue;
        float t = f * dot(e2, q);
        if (t > 1e-5f && t < best_t) {
          best_t = t;
          Vec3 nn{e1.y * e2.z - e1.z * e2.y, e1.z * e2.x - e1.x * e2.z,
                  e1.x * e2.y - e1.y * e2.x};
          float ln = std::sqrt(dot(nn, nn));
          if (ln > 0) { nn.x /= ln; nn.y /= ln; nn.z /= ln; }
          if (dot(nn, d) > 0) { nn.x = -nn.x; nn.y = -nn.y; nn.z = -nn.z; }
          best_n = nn;
          best_id = tri_ids[ti];
        }
      }
    }
    out_t[i] = best_t;
    out_n[3 * i] = best_n.x;
    out_n[3 * i + 1] = best_n.y;
    out_n[3 * i + 2] = best_n.z;
    out_id[i] = best_id;
  }
  delete[] nodes;
  delete[] stack;
  delete[] order;
  delete[] cent;
}

int rt_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
