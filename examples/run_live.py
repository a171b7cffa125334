"""Example: 'live' operation through the native host runtime.

The batched simulation generates scans on worker threads (the C++ loader),
publishes them through the lock-free frame ring (the framework's transport,
replacing ROS topics), and the consumer drives the jitted SLAM step with
double-buffered device_put — the deployment loop for real sensor feeds.

    python examples/run_live.py [--frames 100]
"""

import argparse
import sys
import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=100)
    args = ap.parse_args()

    from slam_tpu.config import sim2d_config
    from slam_tpu.models import ekf as ekf_mod
    from slam_tpu.pipeline import slam2d
    from slam_tpu.runtime import native
    from slam_tpu.sim import world2d

    cfg = sim2d_config()
    world = world2d.make_world(jax.random.PRNGKey(42), cfg.sim)
    B = cfg.sim.num_beams

    # host-side "sensor": a thread renders scans from the true trajectory and
    # publishes (ranges, gyro, cmd) frames into the ring
    ring = native.FrameRing(slots=32, frame_shape=(B + 4,))
    prof = native.Profiler()

    import threading
    stop = threading.Event()

    # pre-render the sensor feed on the main thread (JAX isn't driven from
    # the producer thread — it pushes plain numpy frames, like a replay of a
    # recorded log through the transport). synth_frames is the same
    # synthesis make_replay.py writes to disk — one frame-layout producer.
    from slam_tpu.sim.replay import synth_frames
    frames = synth_frames(world, cfg.sim, args.frames + 8, seed=0)

    def sensor_thread():
        for fr in frames:
            if stop.is_set():
                return
            ring.push(fr)
            time.sleep(0.001)

    # device-side consumer: the registration + fuse + map part of slam_step,
    # fed from host frames
    from slam_tpu.mapping.point_map import (export_points, init_point_map,
                                            shift_point_map, update_point_map)
    from slam_tpu.ops.voxel import crop_box
    from slam_tpu.geometry import se2_apply
    from slam_tpu.ops.icp import icp_fit

    def consume(carry, ranges, gyro, cmd):
        ekf, map_grid, map_cloud = carry
        ekf = ekf_mod.motion_update(ekf, cmd, cfg.sim.dt, cfg.ekf)
        ekf = ekf_mod.yaw_rate_update(ekf, gyro, cfg.ekf)
        pred = jnp.stack([ekf.mu[0], ekf.mu[1], ekf.mu[6]])
        xyz, hit = world2d.scan_to_points(ranges,
                                          ranges < cfg.sim.beam_max_range,
                                          cfg.sim)
        scene = slam2d.build_scene(xyz, hit, cfg)
        target = crop_box(map_cloud, pred[:2], cfg.icp.crop_dist)
        icp = icp_fit(scene.xyz[..., :2], scene.valid, scene.is_ga(),
                      target.xyz[..., :2], target.valid, target.is_ga(),
                      pred, cfg.icp)
        ekf = ekf_mod.slam_update(ekf, icp.pose, cfg.ekf, has_meas=icp.ok)
        fused = jnp.stack([ekf.mu[0], ekf.mu[1], ekf.mu[6]])
        pose = jnp.where(icp.ok, icp.pose, pred)
        wxy = se2_apply(pose, scene.xyz[..., :2])
        mg = shift_point_map(map_grid, fused[:2])
        mg = update_point_map(
            mg, jnp.concatenate([wxy, scene.xyz[..., 2:]], -1), scene.valid)
        mc = export_points(mg, map_cloud.capacity,
                           ga_threshold=cfg.icp.ga_threshold)
        return (ekf, mg, mc), fused

    consume = jax.jit(consume)
    from slam_tpu.types import make_cloud
    carry = (ekf_mod.init_ekf(cfg.ekf, gyro_bias=cfg.sim.gyro_bias),
             init_point_map(cfg.mls.size_x), make_cloud(cfg.cloud.map_capacity))

    # compile BEFORE the producer starts: the first consume() traces for
    # seconds while the 1 kHz feed overflows the 32-slot ring (most of the
    # run used to be dropped frames + a busy-wait to the timeout)
    fr0 = frames[0]
    consume(carry, jnp.asarray(fr0[:B]), jnp.asarray(fr0[B]),
            jnp.asarray(fr0[B + 1: B + 4]))  # warm-up; consume is pure

    t = threading.Thread(target=sensor_thread, daemon=True)
    t.start()
    done = 0
    fused = jnp.zeros(3)  # reported even if the ring never yields a frame
    t0 = time.time()
    while done < args.frames and time.time() - t0 < 120:
        with prof.scope("pop"):
            seq, frame = ring.pop()
        if not seq:
            if not t.is_alive() and ring.available == 0:
                break  # feed exhausted and drained: don't spin to timeout
            time.sleep(0.0005)
            continue
        with prof.scope("device_step"):
            ranges = jnp.asarray(frame[:B])
            gyro = jnp.asarray(frame[B])
            cmd = jnp.asarray(frame[B + 1: B + 4])
            carry, fused = consume(carry, ranges, gyro, cmd)
        done += 1
    stop.set()
    t.join(timeout=5)  # join before teardown: a live producer at interpreter
    # exit races the ring destructor
    jax.block_until_ready(fused)
    print(f"consumed {done} live frames; pose={np.asarray(fused).round(2)}; "
          f"ring dropped={ring.dropped}")
    print(prof.report().strip())


if __name__ == "__main__":
    main()
