// Native host-side data ops for ndivplanning-tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the
// host-side data plane (SURVEY.md §2 C9's "host data pipeline"): batch
// scene rasterisation (scenes -> occupancy images for the conv encoder)
// and expert-trajectory collision validation for recorded-dataset
// preprocessing.  Multithreaded over the batch with std::thread.
//
// Semantics mirror the on-device implementations exactly:
//  - rasterize: data/scenes.py::rasterize_scene — pixel centres at
//    ((i+0.5)/S), binary occupancy (strictly inside any live disc),
//    start/goal Gaussian blobs with sigma = 1.5/S, channels
//    [occupancy, start, goal], row iy = y axis.
//  - collisions: envs/pointmass.py::_collision at waypoint level —
//    a point collides when dist^2 < r^2 for any live obstacle.
//
// Parity-tested against the JAX implementations in tests/test_native.py.

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

inline int clamp_threads(int n_threads, int batch) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > batch) n_threads = batch > 0 ? batch : 1;
  return n_threads;
}

template <typename Fn>
void parallel_over_batch(int batch, int n_threads, Fn fn) {
  n_threads = clamp_threads(n_threads, batch);
  if (n_threads == 1) {
    for (int b = 0; b < batch; ++b) fn(b);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([=]() {
      for (int b = t; b < batch; b += n_threads) fn(b);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// obstacles: [B, max_obs, 3] rows (cx, cy, r); mask: [B, max_obs];
// starts/goals: [B, 2]; out: [B, size, size, 3].
void ndiv_rasterize_scenes(const float* obstacles, const float* mask,
                           const float* starts, const float* goals,
                           int batch, int max_obs, int size, float* out,
                           int n_threads) {
  const float sigma = 1.5f / static_cast<float>(size);
  const float inv_two_sigma2 = 1.0f / (2.0f * sigma * sigma);
  parallel_over_batch(batch, n_threads, [=](int b) {
    const float* obs = obstacles + static_cast<size_t>(b) * max_obs * 3;
    const float* msk = mask + static_cast<size_t>(b) * max_obs;
    const float sx = starts[b * 2 + 0], sy = starts[b * 2 + 1];
    const float gx = goals[b * 2 + 0], gy = goals[b * 2 + 1];
    float* img = out + static_cast<size_t>(b) * size * size * 3;
    for (int iy = 0; iy < size; ++iy) {
      const float y = (iy + 0.5f) / static_cast<float>(size);
      for (int ix = 0; ix < size; ++ix) {
        const float x = (ix + 0.5f) / static_cast<float>(size);
        float occ = 0.0f;
        for (int o = 0; o < max_obs; ++o) {
          if (msk[o] <= 0.5f) continue;
          const float dx = x - obs[o * 3 + 0];
          const float dy = y - obs[o * 3 + 1];
          const float r = obs[o * 3 + 2];
          if (dx * dx + dy * dy < r * r) {
            occ = 1.0f;
            break;
          }
        }
        const float dsx = x - sx, dsy = y - sy;
        const float dgx = x - gx, dgy = y - gy;
        float* px = img + (static_cast<size_t>(iy) * size + ix) * 3;
        px[0] = occ;
        px[1] = std::exp(-(dsx * dsx + dsy * dsy) * inv_two_sigma2);
        px[2] = std::exp(-(dgx * dgx + dgy * dgy) * inv_two_sigma2);
      }
    }
  });
}

// trajs: [B, H, 2] waypoints; obstacles/mask as above (per-batch scene);
// out: [B] uint8, 1 when the polyline through the waypoints intersects a
// live disc.  Swept segment-vs-disc (matching envs/pointmass.py): a point
// check would tunnel through obstacles thinner than one step's travel.
void ndiv_check_collisions(const float* trajs, const float* obstacles,
                           const float* mask, int batch, int horizon,
                           int max_obs, uint8_t* out, int n_threads) {
  parallel_over_batch(batch, n_threads, [=](int b) {
    const float* traj = trajs + static_cast<size_t>(b) * horizon * 2;
    const float* obs = obstacles + static_cast<size_t>(b) * max_obs * 3;
    const float* msk = mask + static_cast<size_t>(b) * max_obs;
    uint8_t hit = 0;
    for (int t = 0; t < horizon && !hit; ++t) {
      // segment from the previous waypoint (or the point itself at t=0)
      const float ax = traj[(t > 0 ? t - 1 : t) * 2 + 0];
      const float ay = traj[(t > 0 ? t - 1 : t) * 2 + 1];
      const float bx = traj[t * 2 + 0], by = traj[t * 2 + 1];
      const float dx = bx - ax, dy = by - ay;
      const float len2 = dx * dx + dy * dy;
      for (int o = 0; o < max_obs; ++o) {
        if (msk[o] <= 0.5f) continue;
        const float cx = obs[o * 3 + 0], cy = obs[o * 3 + 1];
        const float r = obs[o * 3 + 2];
        float tt = 0.0f;
        if (len2 >= 1e-12f) {
          tt = ((cx - ax) * dx + (cy - ay) * dy) / len2;
          if (tt < 0.0f) tt = 0.0f;
          if (tt > 1.0f) tt = 1.0f;
        }
        const float px = ax + tt * dx - cx;
        const float py = ay + tt * dy - cy;
        if (px * px + py * py < r * r) {
          hit = 1;
          break;
        }
      }
    }
    out[b] = hit;
  });
}

}  // extern "C"
