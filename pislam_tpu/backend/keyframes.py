"""Fixed-capacity keyframe store + local map as a checkpointable pytree.

The reference's closest analog is the caller-owned append-only keypoint/
descriptor vectors (Fast.h:198, Orb.h:397-398) and a painted PNG as the only
persistence (demo.cpp:111; SURVEY.md section 5 "checkpoint/resume: none").
Here the map is a real pytree of fixed-shape arrays (XLA-friendly, orbax-
checkpointable, shardable across hosts for pod-scale SLAM):

* keyframes: poses + per-keyframe feature block (codes/desc/valid)
* landmarks: world positions + the descriptor of their anchor observation

Insertion/eviction are functional slot updates (donated in the jitted driver).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KeyframeStore(NamedTuple):
    R: jax.Array            # (F, 3, 3) world->cam
    t: jax.Array            # (F, 3)
    codes: jax.Array        # (F, K) uint32 packed keypoints
    kp_valid: jax.Array     # (F, K) bool
    descriptors: jax.Array  # (F, K, words) uint32
    frame_id: jax.Array     # (F,) int32 source frame index (-1 = empty)
    valid: jax.Array        # (F,) bool

    @property
    def capacity(self):
        return self.R.shape[0]


class LandmarkMap(NamedTuple):
    xyz: jax.Array          # (L, 3) world positions
    descriptors: jax.Array  # (L, words) uint32 anchor descriptors
    obs_count: jax.Array    # (L,) int32
    valid: jax.Array        # (L,) bool


def empty_store(capacity: int, max_kp: int, words: int = 8) -> KeyframeStore:
    return KeyframeStore(
        R=jnp.broadcast_to(jnp.eye(3), (capacity, 3, 3)).astype(jnp.float32),
        t=jnp.zeros((capacity, 3), jnp.float32),
        codes=jnp.zeros((capacity, max_kp), jnp.uint32),
        kp_valid=jnp.zeros((capacity, max_kp), bool),
        descriptors=jnp.zeros((capacity, max_kp, words), jnp.uint32),
        frame_id=jnp.full((capacity,), -1, jnp.int32),
        valid=jnp.zeros((capacity,), bool),
    )


def empty_map(capacity: int, words: int = 8) -> LandmarkMap:
    return LandmarkMap(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        descriptors=jnp.zeros((capacity, words), jnp.uint32),
        obs_count=jnp.zeros((capacity,), jnp.int32),
        valid=jnp.zeros((capacity,), bool),
    )


def insert_keyframe(store: KeyframeStore, slot, R, t, feats, frame_id):
    """Functional slot write (slot may be traced). feats: frontend.Features."""
    return KeyframeStore(
        R=store.R.at[slot].set(R),
        t=store.t.at[slot].set(t),
        codes=store.codes.at[slot].set(feats.codes),
        kp_valid=store.kp_valid.at[slot].set(feats.valid),
        descriptors=store.descriptors.at[slot].set(feats.descriptors),
        frame_id=store.frame_id.at[slot].set(frame_id),
        valid=store.valid.at[slot].set(True),
    )


def next_slot(store: KeyframeStore):
    """First free slot, else the oldest frame (ring eviction)."""
    free = jnp.argmin(store.valid)          # first False if any
    any_free = ~jnp.all(store.valid)
    oldest = jnp.argmin(jnp.where(store.valid, store.frame_id, 2**31 - 1))
    return jnp.where(any_free, free, oldest)
