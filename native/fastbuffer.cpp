// fastbuffer: native ring-buffer replay store for the learning stack.
//
// The reference keeps its replay buffer as Python object lists inside
// torch-facing code (Behavior_Cloning/utils/database.py); at pod-scale
// datagen (thousands of rollouts per control step) the append/sample path
// becomes host-bound. This C++ core provides O(1) vectorized append with
// ring semantics, running mean/std (Welford) over state columns, weighted
// index sampling, and contiguous gather for zero-copy handoff to the JAX
// device transfer. Exposed via a C ABI for ctypes (no pybind11 in the
// image).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

namespace {

struct FastBuffer {
  int64_t capacity;
  int64_t state_dim;
  int64_t action_dim;
  int64_t goal_dim;
  int64_t length = 0;
  int64_t start = 0;

  std::vector<double> states;
  std::vector<double> actions;
  std::vector<double> goals;
  std::vector<int64_t> traj_ids;
  std::vector<double> times;

  // Welford running stats over *currently stored* rows are recomputed on
  // demand (ring evictions make incremental update incorrect); cache keyed
  // on a monotonically increasing version.
  int64_t version = 0;
  int64_t stats_version = -1;
  std::vector<double> mean, m2;

  FastBuffer(int64_t cap, int64_t sd, int64_t ad, int64_t gd)
      : capacity(cap), state_dim(sd), action_dim(ad), goal_dim(gd) {
    states.resize(cap * sd);
    actions.resize(cap * ad);
    goals.resize(cap * gd);
    traj_ids.resize(cap);
    times.resize(cap);
    mean.resize(sd);
    m2.resize(sd);
  }

  int64_t phys(int64_t logical) const { return (start + logical) % capacity; }

  void append(int64_t n, const double* s, const double* a, const double* g,
              const int64_t* ids, const double* ts) {
    for (int64_t i = 0; i < n; ++i) {
      int64_t idx;
      if (length < capacity) {
        idx = (start + length) % capacity;
        ++length;
      } else {
        idx = start;
        start = (start + 1) % capacity;
      }
      std::memcpy(&states[idx * state_dim], s + i * state_dim,
                  sizeof(double) * state_dim);
      std::memcpy(&actions[idx * action_dim], a + i * action_dim,
                  sizeof(double) * action_dim);
      if (g != nullptr)
        std::memcpy(&goals[idx * goal_dim], g + i * goal_dim,
                    sizeof(double) * goal_dim);
      traj_ids[idx] = ids ? ids[i] : 0;
      times[idx] = ts ? ts[i] : 0.0;
    }
    ++version;
  }

  void refresh_stats() {
    if (stats_version == version) return;
    std::fill(mean.begin(), mean.end(), 0.0);
    std::fill(m2.begin(), m2.end(), 0.0);
    for (int64_t i = 0; i < length; ++i) {
      const double* row = &states[phys(i) * state_dim];
      const double k = static_cast<double>(i + 1);
      for (int64_t d = 0; d < state_dim; ++d) {
        const double delta = row[d] - mean[d];
        mean[d] += delta / k;
        m2[d] += delta * (row[d] - mean[d]);
      }
    }
    stats_version = version;
  }
};

}  // namespace

extern "C" {

void* fb_create(int64_t capacity, int64_t state_dim, int64_t action_dim,
                int64_t goal_dim) {
  return new FastBuffer(capacity, state_dim, action_dim, goal_dim);
}

void fb_destroy(void* h) { delete static_cast<FastBuffer*>(h); }

int64_t fb_len(void* h) { return static_cast<FastBuffer*>(h)->length; }

void fb_append(void* h, int64_t n, const double* states, const double* actions,
               const double* goals, const int64_t* traj_ids,
               const double* times) {
  static_cast<FastBuffer*>(h)->append(n, states, actions, goals, traj_ids,
                                      times);
}

// mean/std over stored states (std uses population variance like numpy).
void fb_mean_std(void* h, double* out_mean, double* out_std) {
  auto* fb = static_cast<FastBuffer*>(h);
  fb->refresh_stats();
  for (int64_t d = 0; d < fb->state_dim; ++d) {
    out_mean[d] = fb->mean[d];
    const double var = fb->length > 0 ? fb->m2[d] / fb->length : 0.0;
    out_std[d] = var > 0 ? std::sqrt(var) : 0.0;
  }
}

// Gather rows by logical index into contiguous output buffers.
void fb_gather(void* h, const int64_t* idx, int64_t n, double* out_states,
               double* out_actions, double* out_goals, double* out_times) {
  auto* fb = static_cast<FastBuffer*>(h);
  for (int64_t i = 0; i < n; ++i) {
    const int64_t p = fb->phys(idx[i]);
    std::memcpy(out_states + i * fb->state_dim, &fb->states[p * fb->state_dim],
                sizeof(double) * fb->state_dim);
    std::memcpy(out_actions + i * fb->action_dim,
                &fb->actions[p * fb->action_dim],
                sizeof(double) * fb->action_dim);
    if (out_goals)
      std::memcpy(out_goals + i * fb->goal_dim, &fb->goals[p * fb->goal_dim],
                  sizeof(double) * fb->goal_dim);
    if (out_times) out_times[i] = fb->times[fb->phys(idx[i])];
  }
}

// Weighted sampling WITH replacement of n logical indices (alias-free
// inverse-CDF on the prefix sum; weights == nullptr -> uniform).
void fb_sample_indices(void* h, int64_t n, const double* weights,
                       uint64_t seed, int64_t* out_idx) {
  auto* fb = static_cast<FastBuffer*>(h);
  std::mt19937_64 rng(seed);
  if (weights == nullptr) {
    std::uniform_int_distribution<int64_t> dist(0, fb->length - 1);
    for (int64_t i = 0; i < n; ++i) out_idx[i] = dist(rng);
    return;
  }
  std::vector<double> cdf(fb->length);
  double acc = 0.0;
  for (int64_t i = 0; i < fb->length; ++i) {
    acc += weights[i];
    cdf[i] = acc;
  }
  std::uniform_real_distribution<double> u(0.0, acc);
  for (int64_t i = 0; i < n; ++i) {
    const double r = u(rng);
    out_idx[i] =
        std::lower_bound(cdf.begin(), cdf.end(), r) - cdf.begin();
  }
}

int64_t fb_save(void* h, const char* path) {
  auto* fb = static_cast<FastBuffer*>(h);
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  int64_t header[6] = {fb->capacity, fb->state_dim, fb->action_dim,
                       fb->goal_dim, fb->length, fb->start};
  std::fwrite(header, sizeof(int64_t), 6, f);
  std::fwrite(fb->states.data(), sizeof(double), fb->states.size(), f);
  std::fwrite(fb->actions.data(), sizeof(double), fb->actions.size(), f);
  std::fwrite(fb->goals.data(), sizeof(double), fb->goals.size(), f);
  std::fwrite(fb->traj_ids.data(), sizeof(int64_t), fb->traj_ids.size(), f);
  std::fwrite(fb->times.data(), sizeof(double), fb->times.size(), f);
  std::fclose(f);
  return 0;
}

void* fb_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  int64_t header[6];
  if (std::fread(header, sizeof(int64_t), 6, f) != 6) {
    std::fclose(f);
    return nullptr;
  }
  auto* fb = new FastBuffer(header[0], header[1], header[2], header[3]);
  fb->length = header[4];
  fb->start = header[5];
  bool ok = true;
  ok &= std::fread(fb->states.data(), sizeof(double), fb->states.size(), f) ==
        fb->states.size();
  ok &= std::fread(fb->actions.data(), sizeof(double), fb->actions.size(), f) ==
        fb->actions.size();
  ok &= std::fread(fb->goals.data(), sizeof(double), fb->goals.size(), f) ==
        fb->goals.size();
  ok &= std::fread(fb->traj_ids.data(), sizeof(int64_t), fb->traj_ids.size(),
                   f) == fb->traj_ids.size();
  ok &= std::fread(fb->times.data(), sizeof(double), fb->times.size(), f) ==
        fb->times.size();
  std::fclose(f);
  if (!ok) {
    delete fb;
    return nullptr;
  }
  return fb;
}

}  // extern "C"
