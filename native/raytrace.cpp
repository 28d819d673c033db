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

int rt_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
