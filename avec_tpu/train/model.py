# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Keras-style training engine over jitted JAX steps.

Behavioral parity target: /root/reference/nnet/model.py (Model: compile :80,
build :145, map_to_outputs :177, forward_model :227, train_step :346,
eval_step :411, save :499, load :515, fit :668, evaluate :867, swa :944,
eval_time :1047, save_logits :1079).

TPU-first architecture:
  * functional state {params, batch_stats, opt_state, step, ema_*} — one
    pytree, donated to a single jitted train_step
  * gradient accumulation = lax.scan over stacked micro-batches INSIDE the
    step (ref: manual backward loop, model.py:362-391); grads averaged
  * loss-weight schedules evaluated in-graph at step+1 (ref model.py:287)
  * bf16 compute / fp32 params replaces fp16 + GradScaler: no loss scaling
    needed on TPU; the fbank path stays fp32 (ops/audio.py)
  * data parallelism via the global mesh: batches sharded on 'data', state
    replicated; XLA emits the gradient/batch-norm collectives (no DDP wrap,
    no SyncBatchNorm conversion — see parallel/mesh.py)
  * EMA update fused into the train step (ref model.py:402-407)
  * decoders split device_fn (traced: argmax/CTC collapse) + host
    detokenization; exact corpus metrics via host gather
    (recompute_metrics, ref model.py:921-940)
"""

import json
import math
import os
import re
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from avec_tpu.parallel import mesh as pmesh
from avec_tpu.train import checkpoint as ckpt
from avec_tpu.train.losses import loss_dict
from avec_tpu.train.metrics import metric_dict
from avec_tpu.train.optim import Adam, Optimizer, optim_dict
from avec_tpu.train.schedulers import ConstantScheduler, Scheduler, as_scheduler

PRECISION_MAP = {
    "float32": jnp.float32, "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
    # torch.float16 configs map to bf16: the TPU-native mixed precision.
    "float16": jnp.bfloat16, "fp16": jnp.bfloat16,
}


def resolve_precision(precision) -> Any:
    if precision is None:
        return jnp.float32
    if isinstance(precision, str):
        return PRECISION_MAP[precision]
    if precision in (jnp.float32, jnp.bfloat16, jnp.float16):
        return jnp.bfloat16 if precision == jnp.float16 else precision
    name = getattr(precision, "__name__", None) or str(precision)
    for key, val in PRECISION_MAP.items():
        if key in str(name):
            return val
    return jnp.float32


def _format_outputs(outputs) -> Dict[str, Any]:
    """tensor/list/dict -> dict of named outputs (ref model.py:255-261)."""
    if isinstance(outputs, dict):
        return outputs
    if isinstance(outputs, (list, tuple)):
        return {f"output_{i}": v for i, v in enumerate(outputs)}
    return {"output": outputs}


class Model:
    """Engine base. Subclasses (models/zoo.py) set:

      self.net          linen module
      self.net_inputs   inputs pytree -> tuple of positional args for net
      net.__call__(*args, training=...) -> outputs (dict | list | tensor)
    """

    def __init__(self, name: str = "model", seed: int = 0):
        self.name = name
        self.compiled = False
        self.built = False
        self.rank = jax.process_index()
        self.params = None
        self.batch_stats = None
        self.opt_state = None
        self.model_step = 0
        self.ema_tau = 0.0
        self.ema_params = None
        self.ema_batch_stats = None
        self.grad_max_norm = None
        self.seed = seed
        self.base_rng = jax.random.PRNGKey(seed)
        # Training-step RNG (dropout/augment draws only; param init keeps
        # the threefry base_rng). flax derives a key per module path per
        # microbatch via fold_in; under threefry every fold_in traces as a
        # ~50-op scalar hash — measured 19.3k scalar HLO ops (~2.4 ms/step
        # and a third of the compiled program) on the AV model at B=16.
        # unsafe_rbg makes key derivation O(1) ops and bulk bits a single
        # RngBitGenerator op; "unsafe" refers to derived-stream statistical
        # quality, which is irrelevant for dropout masks. Override with
        # AVEC_TPU_TRAIN_PRNG=threefry2x32 for bit-identical legacy draws.
        impl = os.environ.get("AVEC_TPU_TRAIN_PRNG", "unsafe_rbg")
        try:
            # Typed key (jax.random.key): raw uint32 keys lose their impl.
            self.train_rng = jax.random.key(seed, impl=impl)
        except (TypeError, ValueError):  # unknown impl name: keep default
            import warnings
            warnings.warn(
                f"AVEC_TPU_TRAIN_PRNG={impl!r} is not a PRNG impl this JAX "
                "supports; falling back to the raw threefry base key. "
                "Dropout/augment draws will follow the legacy threefry "
                "stream, NOT the requested impl.", RuntimeWarning)
            self.train_rng = self.base_rng
        self.mesh = None
        # Tensor parallelism: list of (path-regex, PartitionSpec) rules
        # applied at build time (see parallel/mesh.py:param_shardings and
        # gpt_tensor_parallel_rules). None = pure data parallel (reference
        # semantics, SURVEY §2.2).
        self.param_sharding_rules = None
        self._param_shardings = None
        self.infos: Dict[str, Any] = {}
        self.output_names: Optional[List[str]] = None
        self._train_step_cache: Dict = {}
        self._eval_step_fn = None
        self._compute_dtype = jnp.float32

    # ------------------------------------------------------------------ net
    def net_inputs(self, inputs) -> Tuple:
        if isinstance(inputs, (list, tuple)):
            return tuple(inputs)
        return (inputs,)

    def _cast_inputs(self, args: Tuple) -> Tuple:
        if self._compute_dtype == jnp.float32:
            return args
        return tuple(a.astype(self._compute_dtype)
                     if hasattr(a, "dtype") and a.dtype == jnp.float32 else a
                     for a in args)

    def apply_net(self, params, batch_stats, inputs, training: bool, rngs=None,
                  with_aux: bool = False):
        from avec_tpu.ops import module_utils as MU

        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        args = self._cast_inputs(self.net_inputs(inputs))
        mutable = [MU.AUX_LOSS_COLLECTION, MU.INFO_COLLECTION]
        if training and batch_stats:
            mutable.append("batch_stats")
        out, mut = self.net.apply(variables, *args, training=training,
                                  rngs=rngs, mutable=mutable)
        new_bs = mut.get("batch_stats", batch_stats)
        if with_aux:
            return (_format_outputs(out), new_bs,
                    MU.harvest_aux_losses(mut), MU.harvest_infos(mut))
        return _format_outputs(out), new_bs

    # -------------------------------------------------------------- compile
    def compile(self, losses=None, loss_weights=None, optimizer="Adam",
                metrics=None, decoders=None):
        """ref: nnet/model.py:80-143."""
        if isinstance(optimizer, str):
            self.optimizer = optim_dict[optimizer](lr=0.001)
        else:
            self.optimizer = optimizer

        self.compiled_losses = loss_dict[losses]() if isinstance(losses, str) else losses
        if loss_weights is None:
            self.compiled_loss_weights: Any = ConstantScheduler(1.0)
        elif isinstance(loss_weights, (int, float)):
            self.compiled_loss_weights = ConstantScheduler(float(loss_weights))
        else:
            assert isinstance(loss_weights, (dict, list))
            if isinstance(loss_weights, dict):
                self.compiled_loss_weights = {k: as_scheduler(v)
                                              for k, v in loss_weights.items()}
            else:
                self.compiled_loss_weights = [as_scheduler(v) for v in loss_weights]
        self.compiled_metrics = metric_dict[metrics]() if isinstance(metrics, str) else metrics
        if isinstance(decoders, str):
            from avec_tpu.decode import decoder_dict

            decoders = decoder_dict[decoders]()
        self.compiled_decoders = decoders
        self.compiled = True

    def map_to_outputs(self, outputs, struct):
        """Conform struct to the outputs dict (ref: nnet/model.py:177-225)."""
        if struct is None:
            return None
        if isinstance(struct, dict):
            for key in struct:
                if key not in outputs:
                    raise KeyError(
                        f"Found unexpected dict key: {key}. Valid output "
                        f"names are: {list(outputs)}")
            return {key: struct.get(key) for key in outputs}
        if isinstance(struct, list):
            keys = list(outputs)
            return {key: struct[i] if i < len(struct) else None
                    for i, key in enumerate(keys)}
        return {key: struct for key in outputs}

    def _place_params(self, params):
        """Place a params-shaped tree on the mesh (TP shardings or replicate)."""
        if self._param_shardings is not None:
            return pmesh.shard_tree(params, self._param_shardings)
        return pmesh.replicate(self.mesh, params)

    # ---------------------------------------------------------------- build
    def build(self, inputs, precision=None):
        """Init params from a sample batch; map losses/metrics/decoders.

        ref: nnet/model.py:145-175 (lazy build on first batch).
        """
        self._compute_dtype = resolve_precision(precision)
        if self.mesh is None:
            self.mesh = pmesh.make_mesh()

        init_rngs = {"params": self.base_rng,
                     "dropout": jax.random.fold_in(self.base_rng, 1),
                     "augment": jax.random.fold_in(self.base_rng, 2)}
        args = self._cast_inputs(self.net_inputs(inputs))
        variables = self.net.init(init_rngs, *args, training=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})

        # Output-name discovery by tracing only (no compute/compile).
        outputs = _format_outputs(jax.eval_shape(
            lambda v, a: self.net.apply(v, *a, training=False),
            variables, args))
        self.output_names = list(outputs.keys())
        out_proto = {k: None for k in self.output_names}

        self.losses = self.map_to_outputs(out_proto, self.compiled_losses)
        self.loss_weights = self.map_to_outputs(out_proto, self.compiled_loss_weights)
        self.metrics = self.map_to_outputs(out_proto, self.compiled_metrics)
        self.decoders = self.map_to_outputs(out_proto, self.compiled_decoders)

        self.opt_state = self.optimizer.init(self.params)

        if self.ema_tau:
            self.ema_params = jax.tree.map(jnp.copy, self.params)
            self.ema_batch_stats = jax.tree.map(jnp.copy, self.batch_stats)

        # Place state across the mesh: replicated (pure data-parallel) or,
        # when tensor-parallel rules are set, param/optimizer tensors sharded
        # over the 'model' axis (GSPMD inserts the TP collectives).
        if self.param_sharding_rules is not None:
            self._param_shardings = pmesh.param_shardings(
                self.mesh, self.params, self.param_sharding_rules)
            self.params = pmesh.shard_tree(self.params, self._param_shardings)
            self.opt_state = pmesh.shard_like_params(
                self.mesh, self.opt_state, self.params, self._param_shardings)
            if self.ema_params is not None:
                self.ema_params = pmesh.shard_tree(self.ema_params,
                                                   self._param_shardings)
        else:
            self.params = pmesh.replicate(self.mesh, self.params)
            self.opt_state = pmesh.replicate(self.mesh, self.opt_state)
            if self.ema_params is not None:
                self.ema_params = pmesh.replicate(self.mesh, self.ema_params)
        self.batch_stats = pmesh.replicate(self.mesh, self.batch_stats)
        if self.ema_batch_stats is not None:
            self.ema_batch_stats = pmesh.replicate(self.mesh,
                                                   self.ema_batch_stats)

        # Config-requested partial load (e.g. LRW front-end surgery,
        # ref configs/LRS23/AV/EffConfInterCTC.py:70-75).
        if getattr(self, "pending_partial_load", None):
            spec = self.pending_partial_load
            template = {"params": self.params, "batch_stats": self.batch_stats}
            restored = ckpt.restore_tree(template, spec["state_dict"],
                                         strict=False,
                                         rename=spec.get("rename"))
            self.params = pmesh.replicate(self.mesh, restored["params"])
            self.batch_stats = pmesh.replicate(self.mesh, restored["batch_stats"])
            self.pending_partial_load = None
            if self.rank == 0:
                print("Applied partial checkpoint load")

        self.built = True
        if self.rank == 0:
            print(f"Built {self.name}")
            if self.losses:
                print("losses:", {k: type(v).__name__ for k, v in self.losses.items()})
            print("num params: {:,}".format(self.num_params()))

    def set_ema(self, ema_tau: float):
        """ref: nnet/model.py:71-78."""
        self.ema_tau = ema_tau

    # ------------------------------------------------------------- state io
    def _state(self):
        return {"params": self.params, "batch_stats": self.batch_stats,
                "opt_state": self.opt_state,
                "step": jnp.asarray(self.model_step, jnp.int32),
                "ema_params": self.ema_params,
                "ema_batch_stats": self.ema_batch_stats}

    def _load_state(self, state, step: Optional[int] = None):
        self.params = state["params"]
        self.batch_stats = state["batch_stats"]
        self.opt_state = state["opt_state"]
        # int(device_scalar) blocks; the hot loop tracks the step host-side.
        self.model_step = step if step is not None else int(state["step"])
        self.ema_params = state["ema_params"]
        self.ema_batch_stats = state["ema_batch_stats"]

    def num_params(self, tree=None):
        tree = tree if tree is not None else self.params
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

    def summary(self, show_dict=False, show_modules=False):
        """ref: nnet/model.py:428-450."""
        print(f"Model name: {self.name}")
        if self.built:
            print("Number Parameters: {:,}".format(self.num_params()))
            if show_dict:
                self.show_dict()

    def show_dict(self):
        """ref: nnet/model.py:452-471."""
        flat = ckpt.state_dict_flatten(
            {"params": self.params, "batch_stats": self.batch_stats})
        for i, (key, value) in enumerate(flat.items()):
            v = np.asarray(value, dtype=np.float32)
            print(f"{i:<4} {key:<80} numel: {v.size:<10} shape: "
                  f"{str(v.shape):<18} mean: {v.mean():<10.4f} std: "
                  f"{v.std():<10.4f}")

    # ---------------------------------------------------------- loss logic
    def _ctc_batch_group(self, targets):
        """Output keys whose CTC losses can run as ONE batched call.

        The InterCTC models compute 4-6 CTC losses per step against the SAME
        targets; each is a separate alpha/beta lax.scan pair (12 tiny
        latency-bound while loops at B=16, ~3 ms/step profiled). Grouping
        pads every output to the longest frame count and stacks along batch:
        2 while loops total, identical per-sample math (padding is masked by
        logit_lengths). Requires identical CTCLoss config and identical
        target arrays across the group."""
        from avec_tpu.train.losses import CTCLoss

        keys = [k for k in self.output_names
                if isinstance(self.losses.get(k), CTCLoss)]
        if len(keys) < 2:
            return []
        l0, t0 = self.losses[keys[0]], targets[keys[0]]
        for k in keys:
            loss, tgt = self.losses[k], targets[k]
            if not (loss.blank == l0.blank
                    and loss.reduction == l0.reduction
                    and loss.zero_infinity == l0.zero_infinity):
                return []
            if not (isinstance(tgt, (tuple, list)) and len(tgt) == 2
                    and tgt[0] is t0[0] and tgt[1] is t0[1]):
                return []
        return keys

    def _compute_losses(self, outputs, targets, step):
        """Per-output losses + scheduled-weight total (ref model.py:275-287)."""
        from avec_tpu.ops.ctc import ctc_loss as _ctc_loss

        batch_losses = {}
        total = jnp.zeros((), jnp.float32)

        ctc_group = self._ctc_batch_group(targets)
        if ctc_group:
            l0 = self.losses[ctc_group[0]]
            y, y_len = targets[ctc_group[0]]
            t_max = max(int(outputs[k][0].shape[1]) for k in ctc_group)
            logits_cat = jnp.concatenate(
                [jnp.pad(outputs[k][0].astype(jnp.float32),
                         ((0, 0), (0, t_max - outputs[k][0].shape[1]), (0, 0)))
                 for k in ctc_group], axis=0)
            len_cat = jnp.concatenate(
                [outputs[k][1] for k in ctc_group], axis=0)
            n, b = len(ctc_group), y.shape[0]
            nll = _ctc_loss(logits_cat, len_cat,
                            jnp.concatenate([y] * n, axis=0),
                            jnp.concatenate([y_len] * n, axis=0),
                            blank=l0.blank, reduction="none",
                            zero_infinity=l0.zero_infinity).reshape(n, b)
            for i, key in enumerate(ctc_group):
                per = nll[i]
                if l0.reduction == "mean":
                    loss = per.mean()
                elif l0.reduction == "sum":
                    loss = per.sum()
                else:  # "default" == torch mean-over-target-lengths
                    denom = jnp.maximum(y_len.astype(per.dtype), 1.0)
                    loss = (per / denom).mean()
                batch_losses["loss_" + key] = loss
                weight = (self.loss_weights or {}).get(key)
                w = weight(step + 1) if weight is not None else 1.0
                total = total + loss * w

        for key in self.output_names:
            if self.losses.get(key) is None or key in ctc_group:
                continue
            loss = self.losses[key](targets[key], outputs[key])
            batch_losses["loss_" + key] = loss
            weight = (self.loss_weights or {}).get(key)
            w = weight(step + 1) if weight is not None else 1.0
            total = total + loss * w
        if len(batch_losses) > 1:
            return dict({"loss": total}, **batch_losses)
        return {"loss": total}

    def _device_metrics(self, outputs, targets):
        """Traced (non-host) metrics (accuracy family)."""
        out = {}
        for key in self.output_names:
            mspec = (self.metrics or {}).get(key)
            if mspec is None:
                continue
            metrics = mspec if isinstance(mspec, list) else [mspec]
            for metric in metrics:
                if getattr(metric, "on_host", False):
                    continue
                mkey = metric.name if metric.name not in out else f"{metric.name}_{key}"
                out[mkey] = metric(targets[key], outputs[key])
        return out

    def _map_targets(self, targets):
        mapped = self.map_to_outputs({k: None for k in self.output_names}, targets)
        return mapped if mapped is not None else {k: None for k in self.output_names}

    # ------------------------------------------------------------ the steps
    def _get_train_step(self, accumulated_steps: int, eval_training: bool):
        """Cache jitted train steps across fit() calls (periodic-eval loops
        call fit repeatedly; rebuilding would retrace + recompile)."""
        key = (accumulated_steps, eval_training, self.ema_tau,
               self.grad_max_norm)
        if key not in self._train_step_cache:
            self._train_step_cache[key] = self._build_train_step(
                accumulated_steps, eval_training)
        return self._train_step_cache[key]

    def _build_train_step(self, accumulated_steps: int, eval_training: bool):
        opt = self.optimizer
        ema_tau = self.ema_tau
        grad_max_norm = self.grad_max_norm

        def loss_fn(params, batch_stats, micro, rngs, step):
            outputs, new_bs, aux_losses, _ = self.apply_net(
                params, batch_stats, micro["inputs"], True, rngs,
                with_aux=True)
            targets = self._map_targets(micro["targets"])
            losses = self._compute_losses(outputs, targets, step)
            # Module-sown auxiliary losses (ref: nnet/model.py:327-333).
            if aux_losses:
                total = losses["loss"]
                for name, (aux, weight) in aux_losses.items():
                    losses["loss_" + name] = aux
                    total = total + weight * aux
                losses["loss"] = total
            metrics = (self._device_metrics(
                jax.tree.map(lax.stop_gradient, outputs), targets)
                if eval_training else {})
            return losses["loss"], (losses, metrics, new_bs)

        def train_step(state, batch, rng):
            step = state["step"]
            params = state["params"]

            def body(carry, x):
                bs, grad_sum, loss_sum, met_sum = carry
                micro, idx = x
                rngs = {"dropout": jax.random.fold_in(rng, 2 * idx),
                        "augment": jax.random.fold_in(rng, 2 * idx + 1)}
                grads, (losses, metrics, new_bs) = jax.grad(
                    loss_fn, has_aux=True)(params, bs, micro, rngs, step)
                grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
                loss_sum = jax.tree.map(jnp.add, loss_sum, losses)
                met_sum = jax.tree.map(jnp.add, met_sum, metrics)
                return (new_bs, grad_sum, loss_sum, met_sum), None

            if accumulated_steps == 1:
                # No-accumulation fast path: skip the lax.scan wrapper (a
                # 1-iteration scan still pays dynamic-update-slice plumbing
                # and walls off fusion across the loop boundary). Same rng
                # folding as scan idx 0, so results are identical.
                micro0 = jax.tree.map(lambda x: x[0], batch)
                rngs = {"dropout": jax.random.fold_in(rng, 0),
                        "augment": jax.random.fold_in(rng, 1)}
                grads, (losses, metrics, new_bs) = jax.grad(
                    loss_fn, has_aux=True)(params, state["batch_stats"],
                                           micro0, rngs, step)
            else:
                # Probe loss/metric pytree structure abstractly
                # (jax.eval_shape traces without emitting compute).
                micro0 = jax.tree.map(lambda x: x[0], batch)
                zero_grads = jax.tree.map(jnp.zeros_like, params)
                _, (loss_proto, met_proto, _) = jax.eval_shape(
                    loss_fn, params, state["batch_stats"], micro0,
                    {"dropout": rng, "augment": rng}, step)
                loss0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                     loss_proto)
                met0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                    met_proto)

                idxs = jnp.arange(accumulated_steps)
                (new_bs, grad_sum, loss_sum, met_sum), _ = lax.scan(
                    body, (state["batch_stats"], zero_grads, loss0, met0),
                    (batch, idxs))

                grads = jax.tree.map(lambda g: g / accumulated_steps, grad_sum)
                losses = jax.tree.map(lambda l: l / accumulated_steps,
                                      loss_sum)
                metrics = jax.tree.map(lambda m: m / accumulated_steps,
                                       met_sum)

            # Global grad norm (logged; clipped when grad_max_norm set,
            # ref model.py:378-383).
            gnorm = optax_global_norm(grads)
            if grad_max_norm is not None:
                scale = jnp.minimum(1.0, grad_max_norm / (gnorm + 1e-6))
                grads = jax.tree.map(lambda g: g * scale, grads)

            updates, new_opt = opt.update(grads, state["opt_state"], params, step)
            new_params = jax.tree.map(jnp.add, params, updates)

            new_state = dict(state)
            new_state["params"] = new_params
            new_state["batch_stats"] = new_bs
            new_state["opt_state"] = new_opt
            new_state["step"] = step + 1

            if ema_tau and state["ema_params"] is not None:
                new_state["ema_params"] = jax.tree.map(
                    lambda e, p: ema_tau * e + (1.0 - ema_tau) * p,
                    state["ema_params"], new_params)
                # Reference semantics: buffers are COPIED into the EMA model
                # each step, not averaged (nnet/model.py:406-407:
                # buffer_target.copy_(buffer_net)). So ema_batch_stats tracks
                # the live batch_stats exactly.
                new_state["ema_batch_stats"] = new_bs

            infos = {"lr": opt.learning_rate(step), "grad_norm": gnorm}
            return new_state, (losses, metrics, infos)

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_eval_step(self):
        def eval_step(params, batch_stats, batch, step):
            outputs, _ = self.apply_net(params, batch_stats,
                                        batch["inputs"], False, None)
            targets = self._map_targets(batch["targets"])
            losses = self._compute_losses(outputs, targets, step)
            metrics = self._device_metrics(outputs, targets)
            decode_pre = {}
            for key in self.output_names:
                dec = (self.decoders or {}).get(key)
                if dec is None:
                    continue
                d = dec[0] if isinstance(dec, list) else dec
                if hasattr(d, "device_fn"):
                    decode_pre[key] = d.device_fn(outputs[key])
            return losses, metrics, decode_pre

        return jax.jit(eval_step, static_argnames=())

    # ------------------------------------------------------------------ fit
    def fit(self, dataset_train, epochs, dataset_eval=None, eval_steps=None,
            verbose_eval=0, initial_epoch=0, callback_path=None,
            steps_per_epoch=None, precision=None, accumulated_steps=1,
            eval_period_step=None, eval_period_epoch=1,
            saving_period_step=None, saving_period_epoch=1,
            log_figure_period_step=None, log_figure_period_epoch=None,
            step_log_period=10, eval_training=True, dist_log=False,
            grad_init_scale=None, detect_anomaly=False,
            recompute_metrics=False):
        """Training loop (ref: nnet/model.py:668-828).

        grad_init_scale is accepted for config parity and ignored: bf16 on
        TPU needs no loss scaling. detect_anomaly enables jax debug_nans.
        """
        if not self.compiled:
            raise Exception("You must compile your model before training/testing.")
        if detect_anomaly:
            jax.config.update("jax_debug_nans", True)

        # Per-rank logging opt-in (ref: nnet/model.py:596-603 — every rank
        # writes, tags suffixed "-{rank}").
        self._dist_log = bool(dist_log)
        writer = self._make_writer(callback_path)
        train_step = None

        try:
            self._fit_loop(dataset_train, epochs, dataset_eval, eval_steps,
                           verbose_eval, initial_epoch, callback_path,
                           steps_per_epoch, precision, accumulated_steps,
                           eval_period_step, eval_period_epoch,
                           saving_period_step, saving_period_epoch,
                           step_log_period, eval_training, recompute_metrics,
                           writer)
        except Exception as e:
            # Log the failure then re-raise (ref: nnet/model.py:820-828).
            if writer is not None:
                try:
                    writer.add_text("Exceptions",
                                    f"Rank: {self.rank}\n{e}", self.model_step)
                except Exception:
                    pass
            raise
        finally:
            if writer:
                writer.close()

    def _fit_loop(self, dataset_train, epochs, dataset_eval, eval_steps,
                  verbose_eval, initial_epoch, callback_path, steps_per_epoch,
                  precision, accumulated_steps, eval_period_step,
                  eval_period_epoch, saving_period_step, saving_period_epoch,
                  step_log_period, eval_training, recompute_metrics, writer):
        train_step = None

        for epoch in range(initial_epoch, epochs):
            dataset_train.set_epoch(epoch)
            if self.rank == 0:
                print(f"Epoch {epoch + 1}/{epochs}:")

            epoch_losses: Dict[str, float] = {}
            epoch_metrics: Dict[str, float] = {}
            t_epoch = time.time()
            n_steps = 0

            for step_i, batch in enumerate(dataset_train):
                if not self.built:
                    micro = jax.tree.map(
                        lambda x: x[: x.shape[0] // accumulated_steps]
                        if hasattr(x, "shape") and x.ndim else x, batch)
                    self.build(micro["inputs"], precision=precision)
                if train_step is None:
                    train_step = self._get_train_step(accumulated_steps,
                                                      eval_training)

                batch = self._stack_micro(batch, accumulated_steps)
                # (A, B, ...) stacks: the batch axis is axis 1.
                batch = pmesh.host_local_batch_to_global(self.mesh, batch,
                                                         batch_axis=1)
                rng = jax.random.fold_in(self.train_rng, self.model_step + 1)

                state = self._state()
                expected_step = self.model_step + 1
                state, (losses, metrics, infos) = train_step(state, batch, rng)
                self._load_state(state, step=expected_step)
                n_steps += 1

                # Device-side accumulation: no host sync in the hot loop
                # (values are fetched only at log periods / epoch end).
                for k, v in losses.items():
                    epoch_losses[k] = (epoch_losses[k] + v
                                       if k in epoch_losses else v)
                for k, v in metrics.items():
                    epoch_metrics[k] = (epoch_metrics[k] + v
                                        if k in epoch_metrics else v)

                if ((self.rank == 0 or writer)
                        and self.model_step % step_log_period == 0):
                    self.infos.update({
                        "lr": float(infos["lr"]),
                        "grad_norm": round(float(infos["grad_norm"]), 4),
                        "step": self.model_step})
                    if self.rank == 0:
                        self._display(epoch_losses, epoch_metrics, n_steps)
                    if writer:
                        self._log(writer, "Training-step", self.model_step,
                                  losses, metrics, self.infos)

                # Periodic eval/save by step (ref model.py:766-780).
                if (eval_period_step and dataset_eval is not None
                        and self.model_step % eval_period_step == 0):
                    self._evaluate(dataset_eval, writer, self.model_step,
                                   eval_steps, verbose_eval, recompute_metrics,
                                   tag="Evaluation-step")
                if (saving_period_step and callback_path and self.rank == 0
                        and self.model_step % saving_period_step == 0):
                    self.save(os.path.join(
                        callback_path,
                        f"checkpoints_epoch_{epoch + 1}_step_{self.model_step}.ckpt"))

                if steps_per_epoch is not None and n_steps >= steps_per_epoch:
                    break

            denom = max(n_steps, 1)
            epoch_losses = {k: v / denom for k, v in epoch_losses.items()}
            epoch_metrics = {k: v / denom for k, v in epoch_metrics.items()}
            if self.rank == 0:
                dt = time.time() - t_epoch
                self._display(epoch_losses, epoch_metrics, 1)
                print(f"  epoch time {dt:.1f}s ({denom} steps)")
            if writer:
                self._log(writer, "Training-epoch", epoch + 1, epoch_losses,
                          epoch_metrics, {})

            if (eval_period_epoch and dataset_eval is not None
                    and (epoch + 1) % eval_period_epoch == 0):
                self._evaluate(dataset_eval, writer, epoch + 1, eval_steps,
                               verbose_eval, recompute_metrics,
                               tag="Evaluation-epoch")
            if (saving_period_epoch and callback_path and self.rank == 0
                    and (epoch + 1) % saving_period_epoch == 0):
                os.makedirs(callback_path, exist_ok=True)
                self.save(os.path.join(
                    callback_path,
                    f"checkpoints_epoch_{epoch + 1}_step_{self.model_step}.ckpt"))

    def _stack_micro(self, batch, accum: int):
        """(A*B, ...) arrays -> (A, B, ...) micro-batch stacks."""
        def reshape(x):
            x = np.asarray(x)
            assert x.shape[0] % accum == 0, (x.shape, accum)
            return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

        return jax.tree.map(reshape, batch)

    # ------------------------------------------------------------- evaluate
    def _evaluate(self, dataset, writer=None, step=None, eval_steps=None,
                  verbose=0, recompute_metrics=False, tag="Evaluation"):
        """ref: nnet/model.py:830-865."""
        datasets = dataset if isinstance(dataset, list) else [dataset]
        results = []
        for i, ds in enumerate(datasets):
            val_losses, val_metrics = self.evaluate(ds, eval_steps, verbose,
                                                    recompute_metrics)
            results.append((val_losses, val_metrics))
            if self.rank == 0:
                for k, v in {**val_losses, **val_metrics}.items():
                    print(f"eval {k}: {v:.4f}")
            if writer and self.rank == 0:
                self._log(writer, f"{tag}/{i}", step, val_losses, val_metrics, {})
            if self.ema_params is not None:
                ema_losses, ema_metrics = self.evaluate(
                    ds, eval_steps, verbose, recompute_metrics, use_ema=True)
                if self.rank == 0:
                    for k, v in {**ema_losses, **ema_metrics}.items():
                        print(f"ema eval {k}: {v:.4f}")
                if writer and self.rank == 0:
                    self._log(writer, f"{tag}-ema/{i}", step, ema_losses,
                              ema_metrics, {})
        return results

    def evaluate(self, dataset_eval, eval_steps=None, verbose=0,
                 recompute_metrics=False, use_ema=False,
                 return_transcripts=False):
        """ref: nnet/model.py:867-942.

        return_transcripts=True additionally returns the gathered
        {metric_key: (truths, preds)} string lists (the material of the
        exact-WER recompute) as a third element — used by eval tooling and
        the transcript-parity tests; the reference keeps these internal
        (gather_truths_preds, nnet/model.py:645-666).
        """
        if not self.built:
            batch = next(iter(dataset_eval))
            self.build(batch["inputs"])
        if self._eval_step_fn is None:
            self._eval_step_fn = self._build_eval_step()

        params = self.ema_params if use_ema else self.params
        batch_stats = self.ema_batch_stats if use_ema else self.batch_stats

        epoch_losses: Dict[str, float] = {}
        epoch_metrics: Dict[str, float] = {}
        epoch_truths: Dict[str, List[str]] = {}
        epoch_preds: Dict[str, List[str]] = {}
        n = 0

        def _flush(pending):
            host_targets, losses, metrics, decode_pre = pending
            for k, v in losses.items():
                epoch_losses[k] = epoch_losses.get(k, 0.0) + float(v)
            for k, v in metrics.items():
                epoch_metrics[k] = epoch_metrics.get(k, 0.0) + float(v)
            # Host metrics (WER) through decoders (ref model.py:290-324).
            host_batch = self._host_metric_pass(decode_pre, host_targets,
                                                verbose)
            for k, (truths, preds, val) in host_batch.items():
                epoch_metrics[k] = epoch_metrics.get(k, 0.0) + val
                if recompute_metrics or return_transcripts:
                    epoch_truths.setdefault(k, []).extend(truths)
                    epoch_preds.setdefault(k, []).extend(preds)

        # One-deep host/device pipeline: batch i+1's device step is
        # DISPATCHED (async) before batch i's host decode runs, so beam/LM
        # decoding overlaps device compute instead of serializing with it
        # (the reference's loop is fully serial, nnet/model.py:889).
        pending = None
        for step_i, batch in enumerate(dataset_eval):
            host_targets = batch["targets"]
            gbatch = pmesh.host_local_batch_to_global(self.mesh, batch)
            losses, metrics, decode_pre = self._eval_step_fn(
                params, batch_stats, gbatch, jnp.asarray(self.model_step, jnp.int32))
            n += 1
            if pending is not None:
                _flush(pending)
            pending = (host_targets, losses, metrics, decode_pre)
            if eval_steps and n >= eval_steps:
                break
        if pending is not None:
            _flush(pending)

        denom = max(n, 1)
        epoch_losses = {k: v / denom for k, v in epoch_losses.items()}

        if recompute_metrics and epoch_truths:
            # Exact corpus metric over gathered strings (ref :933-936).
            for k in list(epoch_metrics.keys()):
                if k in epoch_truths:
                    truths = sum(pmesh.process_allgather(epoch_truths[k]), [])
                    preds = sum(pmesh.process_allgather(epoch_preds[k]), [])
                    metric = self._host_metric_for(k)
                    epoch_metrics[k] = float(metric(truths, preds))
                else:
                    epoch_metrics[k] = epoch_metrics[k] / denom
        else:
            epoch_metrics = {k: v / denom for k, v in epoch_metrics.items()}
        if return_transcripts:
            transcripts = {k: (epoch_truths.get(k, []), epoch_preds.get(k, []))
                           for k in set(epoch_truths) | set(epoch_preds)}
            return epoch_losses, epoch_metrics, transcripts
        return epoch_losses, epoch_metrics

    def _host_metric_pass(self, decode_pre, host_targets, verbose=0):
        """Decode + host metrics for one batch; returns
        {metric_key: (truths, preds, value)}."""
        out = {}
        if not self.metrics:
            return out
        targets = self._map_targets(host_targets)
        for key in self.output_names:
            mspec = self.metrics.get(key)
            dspec = (self.decoders or {}).get(key)
            if mspec is None or dspec is None or key not in decode_pre:
                continue
            metrics = mspec if isinstance(mspec, list) else [mspec]
            decoder = dspec[0] if isinstance(dspec, list) else dspec
            for metric in metrics:
                if not getattr(metric, "on_host", False):
                    continue
                mkey = metric.name if metric.name not in out else f"{metric.name}_{key}"
                pre_host = jax.tree.map(np.asarray, decode_pre[key])
                truths = decoder(targets[key], from_logits=False)
                preds = decoder(pre_host)
                if verbose:
                    print("Groundtruths:\n", truths)
                    print("Predictions:\n", preds)
                out[mkey] = (truths, preds, float(metric(truths, preds)))
        return out

    def _host_metric_for(self, metric_key):
        for key in self.output_names:
            mspec = (self.metrics or {}).get(key)
            if mspec is None:
                continue
            metrics = mspec if isinstance(mspec, list) else [mspec]
            for metric in metrics:
                if getattr(metric, "on_host", False) and metric.name in metric_key:
                    return metric
        raise KeyError(metric_key)

    # ------------------------------------------------------------- save/load
    def save(self, path: str, save_optimizer: bool = True):
        """ref: nnet/model.py:499-513."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        model_state = {"params": jax.tree.map(np.asarray, self.params),
                       "batch_stats": jax.tree.map(np.asarray, self.batch_stats)}
        ema_state = None
        if self.ema_params is not None:
            ema_state = {"params": jax.tree.map(np.asarray, self.ema_params),
                         "batch_stats": jax.tree.map(np.asarray, self.ema_batch_stats)}
        ckpt.save_checkpoint(
            path, model_state,
            optimizer_state=self.opt_state if save_optimizer else None,
            model_step=self.model_step, ema_state=ema_state)
        if self.rank == 0:
            print(f"Model saved at step {self.model_step}")

    def load(self, path: str, load_optimizer: bool = True, verbose: bool = True,
             strict: bool = True):
        """ref: nnet/model.py:515-544.

        Accepts both our msgpack checkpoints and the released PyTorch
        reference .ckpt pickles — the latter are converted on the fly
        (train/torch_convert.py; logits parity <=3e-6 tested for all five
        released model architectures)."""
        from avec_tpu.train import torch_convert as tc

        if tc.is_torch_checkpoint(path):
            self._load_torch(path, strict=strict, verbose=verbose)
            return
        payload = ckpt.load_checkpoint(path)
        template = {"params": self.params, "batch_stats": self.batch_stats}
        restored = ckpt.restore_tree(template, payload["model_state_dict"],
                                     strict=strict)
        self.params = self._place_params(restored["params"])
        self.batch_stats = pmesh.replicate(self.mesh, restored["batch_stats"])
        if load_optimizer and payload.get("optimizer_state_dict") is not None:
            from flax import serialization

            opt = serialization.from_state_dict(
                self.opt_state, payload["optimizer_state_dict"])
            self.opt_state = (pmesh.shard_like_params(
                self.mesh, opt, self.params, self._param_shardings)
                if self._param_shardings is not None
                else pmesh.replicate(self.mesh, opt))
            self.model_step = int(payload["model_step"])
        if payload.get("ema_model_state_dict") is not None and self.ema_params is not None:
            ema_t = {"params": self.ema_params, "batch_stats": self.ema_batch_stats}
            ema = ckpt.restore_tree(ema_t, payload["ema_model_state_dict"],
                                    strict=strict)
            self.ema_params = self._place_params(ema["params"])
            self.ema_batch_stats = pmesh.replicate(self.mesh, ema["batch_stats"])
        if self.rank == 0 and verbose:
            print(f"Rank {self.rank}: Model loaded at step {self.model_step}")

    def _load_torch(self, path: str, strict: bool = True, verbose: bool = True):
        """Load a reference torch .ckpt via the name/layout converter."""
        from avec_tpu.train import torch_convert as tc
        from flax import serialization

        template_tree = {"params": self.params}
        if self.batch_stats:
            template_tree["batch_stats"] = self.batch_stats
        template = ckpt.state_dict_flatten(template_tree)
        model_flat, ema_flat, step, report = tc.convert_checkpoint(
            path, template, strict=strict)
        restored = serialization.from_state_dict(
            template_tree, ckpt.state_dict_unflatten(model_flat))
        self.params = pmesh.replicate(self.mesh, restored["params"])
        if self.batch_stats:
            self.batch_stats = pmesh.replicate(self.mesh,
                                               restored["batch_stats"])
        self.model_step = step
        if ema_flat is not None and self.ema_params is not None:
            ema = serialization.from_state_dict(
                template_tree, ckpt.state_dict_unflatten(ema_flat))
            self.ema_params = pmesh.replicate(self.mesh, ema["params"])
            if self.batch_stats:
                self.ema_batch_stats = pmesh.replicate(self.mesh,
                                                       ema["batch_stats"])
        if self.rank == 0 and verbose:
            print(f"Rank {self.rank}: converted torch checkpoint loaded at "
                  f"step {self.model_step} "
                  f"({len(model_flat)} tensors, "
                  f"{len(report['dropped'])} torch-only keys dropped)")

    # ------------------------------------------------------------------ swa
    def swa(self, dataset, callback_path, start_epoch=None, end_epoch=None,
            epochs_list=None, update_steps=None, swa_type="equal",
            swa_decay=0.9, precision=None):
        """Stochastic weight averaging + BN re-estimation.

        ref: nnet/model.py:944-1015.
        """
        import glob as globmod

        # Lazy build (the reference model is already built when swa runs,
        # nnet/model.py:944; our engine builds from a sample batch).
        if self.params is None:
            self.build(next(iter(dataset))["inputs"], precision=precision)

        if epochs_list is None:
            epochs_list = list(range(int(start_epoch), int(end_epoch) + 1))
        if self.rank == 0:
            print(f"Stochastic Weight Averaging on checkpoints : {epochs_list}")

        avg = None
        n_avg = 0
        for epoch in epochs_list:
            pattern = os.path.join(callback_path,
                                   f"checkpoints_epoch_{epoch}_step_*.ckpt")
            matches = globmod.glob(pattern)
            assert matches, f"no checkpoint for epoch {epoch}"
            # With saving_period_step there can be several ckpts per epoch;
            # deterministically take the end-of-epoch one (max step).
            matches.sort(key=lambda p: int(
                re.search(r"_step_(\d+)\.ckpt$", p).group(1)))
            self.load(matches[-1], load_optimizer=False, verbose=False,
                      strict=True)
            p = jax.tree.map(np.asarray, self.params)
            if avg is None:
                avg = p
            elif swa_type == "equal":
                avg = jax.tree.map(
                    lambda a, b: a + (b - a) / (n_avg + 1), avg, p)
            else:  # exp
                avg = jax.tree.map(
                    lambda a, b: (1 - swa_decay) * a + swa_decay * b, avg, p)
            n_avg += 1

        self.params = pmesh.replicate(self.mesh, avg)

        if self.rank == 0:
            print("Updating Batch Normalization Statistics")
        # Re-estimate running stats with training-mode forward passes,
        # starting from the last loaded checkpoint's stats (exactly the
        # reference's loop, model.py:988-1007: train-mode BN EMA updates).
        bn_step = jax.jit(lambda p, bs, inputs, rng: self.apply_net(
            p, bs, inputs, True, {"dropout": rng, "augment": rng})[1])

        steps = 0
        update_steps = update_steps if update_steps is not None else len(dataset)
        while steps < update_steps:
            for batch in dataset:
                inputs = pmesh.host_local_batch_to_global(
                    self.mesh, batch)["inputs"]
                rng = jax.random.fold_in(self.train_rng, 999_000 + steps)
                self.batch_stats = bn_step(self.params, self.batch_stats,
                                           inputs, rng)
                steps += 1
                if steps >= update_steps:
                    break

        if self.rank == 0:
            self.save(os.path.join(
                callback_path,
                f"checkpoints_swa-{swa_type}-{epochs_list[0]}-{epochs_list[-1]}.ckpt"),
                save_optimizer=False)
        pmesh.sync_global_devices("swa")

    # ------------------------------------------------------------- generate
    def generate(self, dataset, saving_path=None):
        """Sample-generation loop (ref: nnet/model.py:1017-1045); subclasses
        implement forward_generate."""
        if saving_path is not None and self.rank == 0:
            os.makedirs(saving_path, exist_ok=True)
        for ctr, batch in enumerate(dataset):
            self.forward_generate(batch["inputs"], saving_path,
                                  f"sample_{self.rank}_{ctr}")

    def forward_generate(self, inputs, saving_path, name):
        raise NotImplementedError(
            "generation models must implement forward_generate")

    # ------------------------------------------------------------ eval_time
    def eval_time(self, dataset_eval, eval_steps=None, num_evals=10,
                  warmup_eval=True):
        """ref: nnet/model.py:1047-1077."""
        if warmup_eval:
            print("Warmup Eval")
            self.evaluate(dataset_eval, eval_steps=eval_steps)
        times = []
        for i in range(num_evals):
            print(f"Eval {i + 1}/{num_evals}:")
            start = time.time()
            self.evaluate(dataset_eval, eval_steps=eval_steps)
            times.append(time.time() - start)
        arr = np.asarray(times)
        return {"mean": arr.mean(), "std": arr.std(), "min": arr.min(),
                "max": arr.max()}

    def save_logits(self, dataset_eval, callback_path):
        """Dump logits/targets (ref: nnet/model.py:1079-1116)."""
        logits_list, targets_list = [], []
        fwd = jax.jit(lambda p, bs, inputs: self.apply_net(p, bs, inputs,
                                                           False, None)[0])
        for batch in dataset_eval:
            inputs = pmesh.host_local_batch_to_global(self.mesh, batch)["inputs"]
            out = fwd(self.params, self.batch_stats, inputs)
            logits_list.append(jax.tree.map(np.asarray, out))
            targets_list.append(batch["targets"])
        import pickle

        with open(os.path.join(callback_path, "logits.pkl"), "wb") as f:
            pickle.dump(logits_list, f)
        with open(os.path.join(callback_path, "targets.pkl"), "wb") as f:
            pickle.dump(targets_list, f)

    # -------------------------------------------------------------- logging
    def _make_writer(self, callback_path):
        dist_log = getattr(self, "_dist_log", False)
        if not callback_path or (self.rank != 0 and not dist_log):
            return None
        os.makedirs(os.path.join(callback_path, "logs"), exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(os.path.join(callback_path, "logs"))
        except Exception:
            from avec_tpu.utils.logging import JsonlWriter

            name = (f"events_rank{self.rank}.jsonl" if dist_log
                    else "events.jsonl")
            return JsonlWriter(os.path.join(callback_path, "logs", name))

    def _log(self, writer, tag, step, losses, metrics, infos):
        if getattr(self, "_dist_log", False):
            tag = f"{tag}-{self.rank}"
        for k, v in {**losses, **metrics}.items():
            try:
                writer.add_scalar(f"{tag}/{k}", float(v), step)
            except Exception:
                pass
        for k, v in infos.items():
            if isinstance(v, (int, float)):
                writer.add_scalar(f"{tag}/{k}", float(v), step)

    def _display(self, losses, metrics, steps):
        parts = []
        for k, v in losses.items():
            parts.append(f"{k}: {v / steps:.4f}")
        for k, v in metrics.items():
            parts.append(f"{k}: {v / steps:.4f}")
        for k, v in self.infos.items():
            if k.endswith("lr"):
                parts.append(f"{k}: {v:.2e}")
            else:
                parts.append(f"{k}: {v}")
        print("  " + " - ".join(parts), flush=True)


def optax_global_norm(tree):
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))
