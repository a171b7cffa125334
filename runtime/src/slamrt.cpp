// slamrt implementation. See slamrt.h for the design rationale.

#include "slamrt.h"

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

uint64_t now_ns() {
  return std::chrono::duration_cast<std::chrono::nanoseconds>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

}  // namespace

// ---------- ring buffer ----------

struct slamrt_ring {
  uint32_t slots;
  uint64_t frame_floats;
  std::vector<float> data;          // slots * frame_floats
  // per-slot sequence (seqlock): 0 = empty/being-rewritten, else head+1 at
  // publish time. Atomic: the consumer validates a slot's seq before AND
  // after its copy so a drop_oldest overwrite can never hand out a torn
  // frame (the old code raced: producer overwrote the slot the consumer
  // was memcpy-ing, and both sides blind-stored `tail`)
  std::unique_ptr<std::atomic<uint64_t>[]> seq;
  std::unique_ptr<std::atomic<uint64_t>[]> t_ns;
  std::atomic<uint64_t> head{0};    // next write position (monotonic)
  std::atomic<uint64_t> tail{0};    // next read position (monotonic)
  std::atomic<uint64_t> published{0};
  std::atomic<uint64_t> dropped{0};
  uint64_t pending_write = 0;       // slot acquired but not yet published
  bool has_pending = false;
  std::mutex producer_mu;           // serializes multi-threaded producers
};

slamrt_ring* slamrt_ring_create(uint32_t slots, uint64_t frame_floats) {
  auto* r = new slamrt_ring();
  r->slots = slots;
  r->frame_floats = frame_floats;
  r->data.resize(static_cast<size_t>(slots) * frame_floats);
  r->seq.reset(new std::atomic<uint64_t>[slots]);
  r->t_ns.reset(new std::atomic<uint64_t>[slots]);
  for (uint32_t i = 0; i < slots; ++i) {
    r->seq[i].store(0, std::memory_order_relaxed);
    r->t_ns[i].store(0, std::memory_order_relaxed);
  }
  return r;
}

void slamrt_ring_destroy(slamrt_ring* r) { delete r; }

float* slamrt_ring_acquire(slamrt_ring* r, int drop_oldest) {
  r->producer_mu.lock();  // released in publish (or abort)
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail >= r->slots) {
    if (!drop_oldest) {
      r->producer_mu.unlock();
      return nullptr;
    }
    // overwrite the oldest unread frame. CAS: if the consumer advanced
    // tail concurrently there is room now and nothing was dropped
    if (r->tail.compare_exchange_strong(tail, tail + 1,
                                        std::memory_order_acq_rel))
      r->dropped.fetch_add(1, std::memory_order_relaxed);
  }
  uint32_t slot = head % r->slots;
  // invalidate the slot BEFORE its data is rewritten: a concurrent pop of
  // this slot sees seq != tail+1 and retries at the advanced tail
  r->seq[slot].store(0, std::memory_order_release);
  r->pending_write = head;
  r->has_pending = true;
  return &r->data[static_cast<size_t>(slot) * r->frame_floats];
}

void slamrt_ring_publish(slamrt_ring* r, uint64_t t) {
  if (!r->has_pending) return;
  uint64_t head = r->pending_write;
  uint32_t slot = head % r->slots;
  r->t_ns[slot].store(t ? t : now_ns(), std::memory_order_relaxed);
  r->seq[slot].store(head + 1, std::memory_order_release);
  r->head.store(head + 1, std::memory_order_release);
  r->published.fetch_add(1, std::memory_order_relaxed);
  r->has_pending = false;
  r->producer_mu.unlock();
}

void slamrt_ring_abort(slamrt_ring* r) {
  // producer-side bail-out between acquire and publish (e.g. the caller's
  // frame copy failed): releases the mutex WITHOUT publishing, so a raised
  // exception in the producer can't deadlock every later push
  if (!r->has_pending) return;
  r->has_pending = false;
  r->producer_mu.unlock();
}

uint64_t slamrt_ring_pop(slamrt_ring* r, float* dst, uint64_t* t_out) {
  for (;;) {
    uint64_t tail = r->tail.load(std::memory_order_acquire);
    uint64_t head = r->head.load(std::memory_order_acquire);
    if (tail >= head) return 0;
    uint32_t slot = tail % r->slots;
    uint64_t s0 = r->seq[slot].load(std::memory_order_acquire);
    if (s0 != tail + 1) continue;  // dropped/being rewritten: fresh tail
    std::memcpy(dst, &r->data[static_cast<size_t>(slot) * r->frame_floats],
                r->frame_floats * sizeof(float));
    uint64_t t = r->t_ns[slot].load(std::memory_order_relaxed);
    std::atomic_thread_fence(std::memory_order_acquire);
    if (r->seq[slot].load(std::memory_order_acquire) != s0)
      continue;                    // torn: producer rewrote mid-copy
    if (!r->tail.compare_exchange_strong(tail, tail + 1,
                                         std::memory_order_acq_rel))
      continue;                    // producer dropped this slot first
    if (t_out) *t_out = t;
    return s0;
  }
}

uint64_t slamrt_ring_published(const slamrt_ring* r) {
  return r->published.load(std::memory_order_relaxed);
}
uint64_t slamrt_ring_dropped(const slamrt_ring* r) {
  return r->dropped.load(std::memory_order_relaxed);
}
uint32_t slamrt_ring_available(const slamrt_ring* r) {
  return static_cast<uint32_t>(r->head.load(std::memory_order_acquire) -
                               r->tail.load(std::memory_order_acquire));
}

// ---------- loader ----------

struct slamrt_loader {
  slamrt_ring* ring = nullptr;
  uint64_t frame_floats = 0;
  double rate_hz = 0.0;  // 0 = as fast as possible
  bool loop = false;
  uint64_t seed = 0;
  int num_threads = 1;
  std::string path;  // empty => synthetic
  std::atomic<uint64_t> produced{0};
  std::atomic<bool> running{false};
  std::atomic<int> error{0};  // 1 = replay file could not be opened
  std::vector<std::thread> threads;
};

slamrt_loader* slamrt_loader_create_replay(slamrt_ring* ring, const char* path,
                                           uint64_t frame_floats, int loop,
                                           double rate_hz) {
  auto* l = new slamrt_loader();
  l->ring = ring;
  l->frame_floats = frame_floats;
  l->path = path;
  l->loop = loop != 0;
  l->rate_hz = rate_hz;
  return l;
}

slamrt_loader* slamrt_loader_create_synthetic(slamrt_ring* ring,
                                              uint64_t frame_floats,
                                              uint64_t seed, double rate_hz,
                                              int num_threads) {
  auto* l = new slamrt_loader();
  l->ring = ring;
  l->frame_floats = frame_floats;
  l->seed = seed;
  l->rate_hz = rate_hz;
  l->num_threads = num_threads > 0 ? num_threads : 1;
  return l;
}

namespace {

void replay_worker(slamrt_loader* l) {
  std::ifstream f(l->path, std::ios::binary);
  if (!f) {
    // surfaced via slamrt_loader_error: a typo'd path must not present as
    // a silently-empty ring the consumer waits on forever
    l->error.store(1, std::memory_order_release);
    return;
  }
  const uint64_t bytes = l->frame_floats * sizeof(float);
  std::vector<char> buf(bytes);
  auto period = l->rate_hz > 0
                    ? std::chrono::nanoseconds(
                          static_cast<uint64_t>(1e9 / l->rate_hz))
                    : std::chrono::nanoseconds(0);
  auto next = std::chrono::steady_clock::now();
  bool read_any = false;
  while (l->running.load(std::memory_order_relaxed)) {
    if (!f.read(buf.data(), bytes)) {
      if (!l->loop) break;
      if (!read_any)  // file shorter than one frame: don't busy-spin a core
        std::this_thread::sleep_for(std::chrono::milliseconds(1));
      read_any = false;
      f.clear();
      f.seekg(0);
      continue;
    }
    read_any = true;
    float* slot = slamrt_ring_acquire(l->ring, /*drop_oldest=*/1);
    std::memcpy(slot, buf.data(), bytes);
    slamrt_ring_publish(l->ring, 0);
    l->produced.fetch_add(1, std::memory_order_relaxed);
    if (period.count()) {
      next += period;
      std::this_thread::sleep_until(next);
    }
  }
}

// xorshift64* — deterministic synthetic frames without libc rand state
struct XorShift {
  uint64_t s;
  explicit XorShift(uint64_t seed) : s(seed ? seed : 0x9e3779b97f4a7c15ull) {}
  uint64_t next() {
    s ^= s >> 12;
    s ^= s << 25;
    s ^= s >> 27;
    return s * 0x2545F4914F6CDD1Dull;
  }
  float uniform() {  // [0, 1)
    return static_cast<float>((next() >> 40) * (1.0 / (1ull << 24)));
  }
};

void synthetic_worker(slamrt_loader* l, int tid) {
  XorShift rng(l->seed + 0x1000 * (tid + 1));
  auto period = l->rate_hz > 0
                    ? std::chrono::nanoseconds(static_cast<uint64_t>(
                          1e9 / l->rate_hz * l->num_threads))
                    : std::chrono::nanoseconds(0);
  auto next = std::chrono::steady_clock::now();
  while (l->running.load(std::memory_order_relaxed)) {
    float* slot = slamrt_ring_acquire(l->ring, /*drop_oldest=*/1);
    for (uint64_t i = 0; i < l->frame_floats; ++i)
      slot[i] = rng.uniform() * 100.0f - 50.0f;
    slamrt_ring_publish(l->ring, 0);
    l->produced.fetch_add(1, std::memory_order_relaxed);
    if (period.count()) {
      next += period;
      std::this_thread::sleep_until(next);
    }
  }
}

}  // namespace

void slamrt_loader_start(slamrt_loader* l) {
  if (l->running.exchange(true)) return;
  if (l->path.empty()) {
    for (int t = 0; t < l->num_threads; ++t)
      l->threads.emplace_back(synthetic_worker, l, t);
  } else {
    l->threads.emplace_back(replay_worker, l);
  }
}

void slamrt_loader_stop(slamrt_loader* l) {
  l->running.store(false);
  for (auto& t : l->threads)
    if (t.joinable()) t.join();
  l->threads.clear();
}

void slamrt_loader_destroy(slamrt_loader* l) {
  slamrt_loader_stop(l);
  delete l;
}

uint64_t slamrt_loader_produced(const slamrt_loader* l) {
  return l->produced.load(std::memory_order_relaxed);
}

int slamrt_loader_error(const slamrt_loader* l) {
  return l->error.load(std::memory_order_acquire);
}

// ---------- profiler ----------

struct ProfEntry {
  std::string name;
  std::atomic<uint64_t> calls{0};
  std::atomic<uint64_t> total_ns{0};
  std::atomic<uint64_t> min_ns{~0ull};
  std::atomic<uint64_t> max_ns{0};
};

struct slamrt_prof {
  static constexpr int kMax = 256;
  ProfEntry entries[kMax];
  std::atomic<int32_t> count{0};
  std::mutex mu;
  // per-thread open-scope start stamps, keyed by (thread, id): keep a simple
  // thread_local stack since scopes nest
};

namespace {
thread_local std::vector<std::pair<int32_t, uint64_t>> g_prof_stack;
}

slamrt_prof* slamrt_prof_create() { return new slamrt_prof(); }
void slamrt_prof_destroy(slamrt_prof* p) { delete p; }

int32_t slamrt_prof_lookup(const slamrt_prof* p, const char* name) {
  int32_t n = p->count.load(std::memory_order_acquire);
  for (int32_t i = 0; i < n; ++i)
    if (p->entries[i].name == name) return i;
  return -1;
}

int32_t slamrt_prof_begin(slamrt_prof* p, const char* name) {
  int32_t id = slamrt_prof_lookup(p, name);
  if (id < 0) {
    std::lock_guard<std::mutex> g(p->mu);
    id = slamrt_prof_lookup(p, name);
    if (id < 0) {
      id = p->count.load(std::memory_order_relaxed);
      if (id >= slamrt_prof::kMax) return -1;
      p->entries[id].name = name;
      p->count.store(id + 1, std::memory_order_release);
    }
  }
  g_prof_stack.emplace_back(id, now_ns());
  return id;
}

void slamrt_prof_end(slamrt_prof* p, int32_t id) {
  // id < 0 = begin() overflowed the name table and pushed nothing: the
  // unwind loop below would otherwise drain (and lose) every open scope
  if (id < 0) return;
  uint64_t t1 = now_ns();
  while (!g_prof_stack.empty()) {
    auto [open_id, t0] = g_prof_stack.back();
    g_prof_stack.pop_back();
    if (open_id != id) continue;  // unwind mismatched scopes
    auto& e = p->entries[id];
    uint64_t dt = t1 - t0;
    e.calls.fetch_add(1, std::memory_order_relaxed);
    e.total_ns.fetch_add(dt, std::memory_order_relaxed);
    uint64_t cur = e.min_ns.load(std::memory_order_relaxed);
    while (dt < cur &&
           !e.min_ns.compare_exchange_weak(cur, dt, std::memory_order_relaxed))
      ;
    cur = e.max_ns.load(std::memory_order_relaxed);
    while (dt > cur &&
           !e.max_ns.compare_exchange_weak(cur, dt, std::memory_order_relaxed))
      ;
    return;
  }
}

void slamrt_prof_stats(const slamrt_prof* p, int32_t id, uint64_t* calls,
                       double* total_us, double* min_us, double* max_us) {
  if (id < 0 || id >= p->count.load(std::memory_order_acquire)) {
    if (calls) *calls = 0;
    return;
  }
  const auto& e = p->entries[id];
  uint64_t c = e.calls.load(std::memory_order_relaxed);
  if (calls) *calls = c;
  if (total_us) *total_us = e.total_ns.load(std::memory_order_relaxed) / 1e3;
  if (min_us) *min_us = c ? e.min_ns.load(std::memory_order_relaxed) / 1e3 : 0;
  if (max_us) *max_us = e.max_ns.load(std::memory_order_relaxed) / 1e3;
}

uint64_t slamrt_prof_report(const slamrt_prof* p, char* buf, uint64_t cap) {
  uint64_t off = 0;
  int32_t n = p->count.load(std::memory_order_acquire);
  for (int32_t i = 0; i < n && off + 128 < cap; ++i) {
    const auto& e = p->entries[i];
    uint64_t c = e.calls.load(std::memory_order_relaxed);
    double tot = e.total_ns.load(std::memory_order_relaxed) / 1e3;
    int ret = std::snprintf(buf + off, cap - off,
                            "%-32s calls=%8llu total=%12.1fus avg=%10.2fus\n",
                            e.name.c_str(),
                            static_cast<unsigned long long>(c), tot,
                            c ? tot / c : 0.0);
    if (ret < 0) break;
    // snprintf returns the WOULD-BE length on truncation; advancing by it
    // would report bytes past what was written (even past cap)
    off += std::min<uint64_t>(static_cast<uint64_t>(ret), cap - off - 1);
  }
  return off;
}
