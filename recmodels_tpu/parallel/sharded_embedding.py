"""Row-sharded embedding tables with all-to-all ID exchange.

THE central architectural change vs the reference (BASELINE.json:5 "local
embedding matrices -> sharded table shards + all-to-all"; SURVEY.md §2a #8,
§5.8): BigDL keeps every table replicated in every model replica; here each
device owns a contiguous block of every stacked table's rows, and lookups are
a three-hop exchange executed *inside* the jit'd step:

  1. bucket this device's flat row ids by owning shard (fixed capacity C per
     destination + overflow counting — SURVEY.md §7 hard part 1);
  2. ``all_to_all`` the id buckets (requester -> owner);
  3. owners gather rows from their local shard; ``all_to_all`` the rows back;
  4. un-permute into the batch's original order.

The gradient path runs the same route in reverse: per-occurrence grad rows
go requester -> owner, the owner dedups them with sort+segment-sum and
applies the sparse optimizer to its local shard + local optimizer state
(optimizer state lives with its rows — the ZeRO-1-like partitioning the
reference also had, SURVEY.md §3.4).

This is exactly expert-parallelism's token->owner exchange (SURVEY.md §2c),
expressed with ``jax.lax.all_to_all`` under ``shard_map`` so XLA emits ICI
collectives — no transport code.

Sharding layout: tables pad ``total_rows`` up to a multiple of n_shards and
block-shard: shard s owns global rows [s*R, (s+1)*R). Hashed ids are uniform
over each slot's vocab range, so block shards are load-balanced in
expectation; overflow capacity ``C = ceil(N/S * capacity_factor)`` absorbs
the multinomial tail (overflowed lookups return zero rows and drop their
grads; the count is observable via ``gather_with_stats``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from recmodels_tpu.embedding.collection import EmbeddingCollection
from recmodels_tpu.embedding.optim import SparseOptimizer


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


class ShardedTables:
    """Table strategy (engine.py API) that runs under ``shard_map``.

    All methods other than init_* assume they execute per-device inside a
    ``shard_map`` over ``axis_name``, with ``emb_params[coll][group]`` being
    the LOCAL shard ``[padded_rows / n_shards, dim]``.
    """

    def __init__(
        self,
        collections: Dict[str, EmbeddingCollection],
        sparse_opt: SparseOptimizer,
        n_shards: int,
        axis_name: str = "data",
        capacity_factor: float = 2.0,
        local_batch_hint: int | None = None,
        fast_dtype=None,
    ):
        self.collections = collections
        self.sparse_opt = sparse_opt
        self.n_shards = n_shards
        self.axis_name = axis_name
        self.capacity_factor = capacity_factor
        # fast_dtype=bf16 (set by the engine for bf16-compute models with an
        # Adagrad master, same trigger as LocalTables): eligible masters are
        # packed [n_tiles, d8, tr] and the OWNER-side lookup/update run the
        # Pallas sweep kernels on each shard — XLA's per-row gather/scatter
        # is just as op-bound on a shard as on a replicated table. Packing
        # happens on the GLOBAL table; tiles are contiguous row blocks, so
        # sharding the tile axis (state_specs P('data') on axis 0) hands each
        # device exactly the pack() of its row shard.
        self.fast_dtype = fast_dtype

    # ------------------------------------------------------------ geometry
    def padded_rows(self, coll: str, group) -> int:
        # multiple of n_shards (even shards) AND of 1024 per shard (the
        # Pallas sorted-update kernel needs tile-divisible local tables)
        unit = self.n_shards * 1024
        return _cdiv(group.alloc_rows, unit) * unit

    def rows_per_shard(self, coll: str, group) -> int:
        return self.padded_rows(coll, group) // self.n_shards

    def _capacity(self, n_flat_ids: int) -> int:
        # per-destination bucket capacity; multiple of 8 for TPU sublanes
        c = _cdiv(int(n_flat_ids * self.capacity_factor), self.n_shards)
        return max(8, _cdiv(c, 8) * 8)

    # ---------------------------------------------------------------- init
    def init_params(self, rng: jax.Array) -> Dict[str, Dict[str, jnp.ndarray]]:
        """GLOBAL (unsharded-shape) params; shard with parallel.shard_state."""
        out = {}
        for name, coll in self.collections.items():
            rng, sub = jax.random.split(rng)
            tables = coll.init(sub)
            out[name] = {}
            for g in coll.groups:
                pad = self.padded_rows(name, g) - g.alloc_rows
                widths = ((0, pad),) if g.dim == 1 else ((0, pad), (0, 0))
                out[name][g.name] = jnp.pad(tables[g.name], widths)
        return out

    def _packs(self, table) -> bool:
        from recmodels_tpu.embedding import pallas_gather

        return (
            self.fast_dtype is not None
            # Adagrad and lazy Adam both have packed sweep-update kernels
            # (optim.apply_updates routes by opt.name + layout)
            and self.sparse_opt.name in ("adagrad", "adam")
            and pallas_gather.supported(table)
        )

    def pack_params(self, params) -> Dict[str, Dict[str, jnp.ndarray]]:
        """One-time repack of eligible GLOBAL masters into the kernel-native
        tiled layout (engine.init calls this after init-time 2-D edits;
        per-shard rows are 1024-multiples, so the tile axis shards evenly)."""
        from recmodels_tpu.embedding import pallas_gather

        return {
            name: {
                g: pallas_gather.pack(t) if self._packs(t) else t
                for g, t in tabs.items()
            }
            for name, tabs in params.items()
        }

    def init_opt(self, params) -> Dict[str, Dict[str, Any]]:
        from recmodels_tpu.embedding import pallas_gather

        out = {}
        for name, coll in self.collections.items():
            out[name] = {}
            for g in coll.groups:
                st = self.sparse_opt.init(self.padded_rows(name, g), g.dim)
                if params[name][g.name].ndim == 3:  # packed master
                    st = {k: pallas_gather.pack(v) for k, v in st.items()}
                out[name][g.name] = st
        return out

    # ------------------------------------------------------------ exchange
    def _plan(self, ids_flat: jnp.ndarray, rows_per_shard: int, cap: int):
        """Routing plan for one group's flat global row ids [N].

        Returns (send_slots [N] int32 with D*C sentinel for overflow,
                 send_ids [D*C] with OOB sentinel, order [N], inv_order [N],
                 overflow count).
        XLA CSEs this between gather and apply_grads (same inputs, pure ops),
        so the plan is effectively computed once per step.
        """
        n = ids_flat.shape[0]
        d = self.n_shards
        owner = (ids_flat // rows_per_shard).astype(jnp.int32)
        order = jnp.argsort(owner, stable=True)
        sorted_owner = owner[order]
        sorted_ids = ids_flat[order]
        counts = jax.ops.segment_sum(jnp.ones_like(owner), owner, num_segments=d)
        offsets = jnp.cumsum(counts) - counts  # start of each owner run
        pos = jnp.arange(n, dtype=jnp.int32) - offsets[sorted_owner]
        valid = pos < cap
        slots = jnp.where(valid, sorted_owner * cap + pos, d * cap)  # OOB sentinel
        send_ids = jnp.full((d * cap,), jnp.iinfo(jnp.int32).max, jnp.int32)
        send_ids = send_ids.at[slots].set(sorted_ids, mode="drop")
        inv_order = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        overflow = jnp.sum(~valid)
        return slots, send_ids, order, inv_order, overflow

    def _gather_group(self, table_local, ids_flat, rows_per_shard,
                      with_stats=False, dtype=None, dim=None):
        d = self.n_shards
        n = ids_flat.shape[0]
        one_d = table_local.ndim == 1  # dim-1 tables are stored 1-D
        cap = self._capacity(n)
        slots, send_ids, order, inv_order, overflow = self._plan(ids_flat, rows_per_shard, cap)
        # hop 1: requester -> owner (ids)
        recv_ids = jax.lax.all_to_all(
            send_ids.reshape(d, cap), self.axis_name, split_axis=0, concat_axis=0
        )
        my_index = jax.lax.axis_index(self.axis_name)
        local_idx = recv_ids - my_index * rows_per_shard  # sentinel stays OOB
        if table_local.ndim == 3:
            # packed shard -> owner-side Pallas sorted sweep. Sentinel /
            # unfilled slots are CLAMPED into range and gather a real row:
            # harmless, because requesters only read back the slots they
            # filled (overflow positions map to the OOB slot d*cap and fill
            # zero below). bf16 rows halve hop-2 bytes like the dtype cast.
            from recmodels_tpu.embedding import pallas_gather

            flat = jnp.clip(local_idx.reshape(-1), 0, rows_per_shard - 1)
            iota = jnp.arange(flat.shape[0], dtype=jnp.int32)
            sidx, order2 = jax.lax.sort_key_val(flat.astype(jnp.int32), iota)
            rows_sorted = pallas_gather.sorted_gather(
                table_local, sidx,
                # honor the same dtype contract as the XLA branch below
                # (callers today always pass dtype == fast_dtype; this keeps
                # the packed branch correct for any other caller too)
                out_dtype=dtype if dtype is not None else self.fast_dtype,
            )
            inv2 = jax.lax.sort_key_val(order2, iota)[1]
            rows = jnp.take(rows_sorted[:, :dim], inv2, axis=0)
        else:
            rows = table_local.at[local_idx.reshape(-1)].get(mode="fill", fill_value=0.0)
            if dtype is not None and rows.dtype != dtype:
                rows = rows.astype(dtype)  # before hop 2: halves return-trip bytes
        # hop 2: owner -> requester (rows)
        shape = (d, cap) if one_d else (d, cap, rows.shape[-1])
        back = jax.lax.all_to_all(
            rows.reshape(shape), self.axis_name, split_axis=0, concat_axis=0
        )
        flat_rows = back.reshape((d * cap,) if one_d else (d * cap, -1))
        sorted_rows = flat_rows.at[slots].get(mode="fill", fill_value=0.0)
        out = sorted_rows[inv_order]
        if with_stats:
            return out, overflow
        return out

    def _scatter_group(self, table_local, opt_state, ids_flat, grads_flat,
                       rows_per_shard, step, lr):
        d = self.n_shards
        n = ids_flat.shape[0]
        one_d = grads_flat.ndim == 1  # dim-1 group: grads are [N]
        cap = self._capacity(n)
        slots, send_ids, order, inv_order, _ = self._plan(ids_flat, rows_per_shard, cap)
        sorted_grads = grads_flat[order]
        buf_shape = (d * cap,) if one_d else (d * cap, grads_flat.shape[-1])
        send_grads = jnp.zeros(buf_shape, grads_flat.dtype)
        send_grads = send_grads.at[slots].set(sorted_grads, mode="drop")
        # grads ride requester -> owner, aligned with the id buckets
        recv_ids = jax.lax.all_to_all(
            send_ids.reshape(d, cap), self.axis_name, split_axis=0, concat_axis=0
        )
        a2a_shape = (d, cap) if one_d else (d, cap, grads_flat.shape[-1])
        recv_grads = jax.lax.all_to_all(
            send_grads.reshape(a2a_shape), self.axis_name, split_axis=0, concat_axis=0
        )
        my_index = jax.lax.axis_index(self.axis_name)
        local_idx = (recv_ids - my_index * rows_per_shard).reshape(-1)
        # sentinel/padding ids land far out of [0, rows_per_shard): clamp into
        # the dedup sentinel space by mapping anything OOB to rows_per_shard
        local_idx = jnp.where(
            (local_idx >= 0) & (local_idx < rows_per_shard), local_idx, rows_per_shard
        ).astype(jnp.int32)
        recv_flat = recv_grads.reshape((-1,) if one_d else (-1, grads_flat.shape[-1]))
        from recmodels_tpu.embedding.optim import apply_updates

        return apply_updates(
            self.sparse_opt, table_local, opt_state, local_idx, recv_flat, step, lr
        )

    # ----------------------------------------------------- engine strategy
    def gather(self, emb_params, gids, dtype=None, emb_opt=None, with_stats=False):
        """``with_stats``: also return the total dropped-lookup (overflow)
        count, so the training loop can surface capacity misconfiguration
        instead of silently training on zero rows."""
        del emb_opt
        out, total = {}, jnp.zeros((), jnp.int32)
        for name, coll in self.collections.items():
            out[name] = {}
            for g in coll.groups:
                ids = gids[name][g.name]
                b, ns = ids.shape
                src = emb_params[name][g.name]
                res = self._gather_group(
                    src, ids.reshape(-1),
                    self.rows_per_shard(name, g), with_stats=with_stats,
                    dtype=dtype, dim=g.dim,
                )
                rows, ovf = res if with_stats else (res, None)
                out[name][g.name] = rows.reshape(b, ns, g.dim)  # 1-D groups expand here
                if with_stats:
                    total = total + ovf
        if with_stats:
            return out, total
        return out

    def gather_with_stats(self, emb_params, gids):
        """gather + total overflow count (for logging/monitoring)."""
        return self.gather(emb_params, gids, with_stats=True)

    def apply_grads(self, emb_params, emb_opt, gids, grad_rows, step, lr):
        new_params, new_opt = {}, {}
        for name, coll in self.collections.items():
            new_params[name], new_opt[name] = {}, {}
            for g in coll.groups:
                ids = gids[name][g.name].reshape(-1)
                gr0 = grad_rows[name][g.name]
                gr = gr0.reshape(-1) if g.dim == 1 else gr0.reshape(-1, g.dim)
                table, opt = self._scatter_group(
                    emb_params[name][g.name],
                    emb_opt[name][g.name],
                    ids,
                    gr,
                    self.rows_per_shard(name, g),
                    step,
                    lr,
                )
                new_params[name][g.name] = table
                new_opt[name][g.name] = opt
        return new_params, new_opt
