// slamrt: native host runtime for the slam_tpu framework.
//
// TPU-native replacement for the reference stack's runtime layer:
//   - ROS pub/sub transport (nasa_mapping.launch wiring)  -> lock-free SPSC
//     frame ring buffers feeding double-buffered jax.device_put
//   - single-threaded ros::spin sensor ingest              -> multi-threaded
//     producer pool (replay or synthetic generation) with batched frames
//   - AprilTag's timeprofile.h scoped profiler             -> slamrt_prof_*
//
// Pure C ABI for ctypes binding (no pybind11 in this image).

#ifndef SLAMRT_H_
#define SLAMRT_H_

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

// ---------- frame ring buffer (SPSC per channel) ----------

// A frame is a fixed-size float32 payload (e.g. B x N x 3 scan batch) plus a
// monotonically increasing sequence id and a timestamp.
typedef struct slamrt_ring slamrt_ring;

// Create a ring with `slots` frames of `frame_floats` float32 each.
slamrt_ring* slamrt_ring_create(uint32_t slots, uint64_t frame_floats);
void slamrt_ring_destroy(slamrt_ring* r);

// Producer: acquire a writable slot (returns NULL if ring is full and
// drop_oldest is 0; otherwise overwrites the oldest unread frame).
float* slamrt_ring_acquire(slamrt_ring* r, int drop_oldest);
// Publish the acquired slot with a timestamp (nanoseconds).
void slamrt_ring_publish(slamrt_ring* r, uint64_t t_ns);
// Abandon an acquired-but-unpublished slot (producer-side error recovery:
// releases the producer lock without publishing).
void slamrt_ring_abort(slamrt_ring* r);

// Consumer: pop the next frame into `dst` (frame_floats floats). Returns the
// sequence id (>=1) or 0 if no frame is available. Copies out so the slot is
// immediately reusable (the Python side hands `dst` to jax.device_put).
uint64_t slamrt_ring_pop(slamrt_ring* r, float* dst, uint64_t* t_ns);

// Stats.
uint64_t slamrt_ring_published(const slamrt_ring* r);
uint64_t slamrt_ring_dropped(const slamrt_ring* r);
uint32_t slamrt_ring_available(const slamrt_ring* r);

// ---------- threaded scan loader ----------
//
// Drives a ring from worker threads. Two sources:
//   - replay: a binary file of little-endian float32 frames (the de-facto
//     "rosbag" of this framework; see tools/make_replay.py)
//   - synthetic: deterministic procedural frames (seeded), for soak tests

typedef struct slamrt_loader slamrt_loader;

slamrt_loader* slamrt_loader_create_replay(slamrt_ring* ring,
                                           const char* path,
                                           uint64_t frame_floats,
                                           int loop,
                                           double rate_hz);
slamrt_loader* slamrt_loader_create_synthetic(slamrt_ring* ring,
                                              uint64_t frame_floats,
                                              uint64_t seed,
                                              double rate_hz,
                                              int num_threads);
void slamrt_loader_start(slamrt_loader* l);
void slamrt_loader_stop(slamrt_loader* l);
void slamrt_loader_destroy(slamrt_loader* l);
uint64_t slamrt_loader_produced(const slamrt_loader* l);
// 1 when a replay worker failed to open its file (surfaced so a typo'd
// path doesn't present as a silently-empty ring), else 0.
int slamrt_loader_error(const slamrt_loader* l);

// ---------- scoped microsecond profiler ----------

typedef struct slamrt_prof slamrt_prof;

slamrt_prof* slamrt_prof_create(void);
void slamrt_prof_destroy(slamrt_prof* p);
// Begin/end a named scope (name interned on first use; max 256 names).
int32_t slamrt_prof_begin(slamrt_prof* p, const char* name);
void slamrt_prof_end(slamrt_prof* p, int32_t id);
// Aggregates for a name id: calls, total us, min us, max us.
void slamrt_prof_stats(const slamrt_prof* p, int32_t id, uint64_t* calls,
                       double* total_us, double* min_us, double* max_us);
int32_t slamrt_prof_lookup(const slamrt_prof* p, const char* name);
// Render a report into buf (returns bytes written).
uint64_t slamrt_prof_report(const slamrt_prof* p, char* buf, uint64_t cap);

#ifdef __cplusplus
}
#endif

#endif  // SLAMRT_H_
