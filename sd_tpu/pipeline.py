"""Text2ImagePipeline — the one-object serving API for capability config #5.

The reference's equivalent "pipeline" is an ad-hoc combination of
Diffusion/main.py model assembly + DDIMSampler + first-stage decode
(reference: Diffusion/main.py:20-129, ldm/diffusion/ddpm.py:1742-1826);
here it is a single object designed for production serving on TPU:

  * one jitted end-to-end program (CLIP encode → scan-DDIM with CFG →
    VAE decode), compiled per (batch, steps) shape and cached;
  * weights load from an SD v1 checkpoint (`from_sd_checkpoint`) via
    sd_tpu.models.sd_import, or random-init from a config;
  * bf16 params with fp32 norm/softmax islands (the numerics contract);
  * deterministic: same seed → same images.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


class Text2ImagePipeline:
    def __init__(self, cfg: dict, rng: jax.Array | None = None,
                 param_dtype=jnp.bfloat16):
        from sd_tpu.train.runners import build_ldm

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # init the UNet directly in param_dtype — at the 859M-param
        # flagship shape an fp32 init + cast would transiently hold both
        (self.ld, self.unet, self.unet_params, self.vae, self.vae_params,
         self.clip) = build_ldm(cfg, rng, param_dtype=param_dtype)
        self.cfg = cfg
        self.param_dtype = param_dtype
        if param_dtype is not None:
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(param_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
            self.unet_params = cast(self.unet_params)
            self.vae_params = cast(self.vae_params)
            self.clip.params = cast(self.clip.params)
        self._jitted = {}
        self.mesh = None  # set by shard_for_serving()
        self._ti_expansions: dict[str, str] = {}  # load_textual_inversion
        self.controlnet = None        # set by load_controlnet()
        self.cn_params = None
        self.control_scale = 1.0
        self.ip_params = None         # set by load_ip_adapter()
        self.ip_scale = 1.0
        self._rebind_first_stage()

    def _ld_with_first_stage(self, vae_params=None):
        """LatentDiffusion view whose encode/decode closures use the
        pipeline's CURRENT first-stage params. build_ldm's closures capture
        the build-time init tree, but the pipeline swaps `self.vae_params`
        afterwards (bf16 cast, `from_sd_checkpoint` import,
        `shard_for_serving` placement). Jitted programs pass their traced
        `vae_params` argument so the weights stay program INPUTS (not
        baked-in constant copies); with `vae_params=None` the closures read
        `self.vae_params` late, at trace time — the right default for
        direct `pipe.ld` use."""
        import dataclasses as _dc

        from sd_tpu.models.autoencoder import AutoencoderKL, VQModel

        get = ((lambda: self.vae_params) if vae_params is None
               else (lambda: vae_params))
        vae = self.vae
        if isinstance(vae, VQModel):
            enc = lambda x, r: vae.apply(
                {"params": get()}, x, method=VQModel.encode_pre_quant)
            dec = lambda z: vae.apply(
                {"params": get()}, z, method=VQModel.decode_with_quantize)
        else:
            enc = lambda x, r: vae.apply(
                {"params": get()}, x,
                method=AutoencoderKL.encode).sample(r)
            dec = lambda z: vae.apply(
                {"params": get()}, z, method=AutoencoderKL.decode)
        return _dc.replace(self.ld, encode_fn=enc, decode_fn=dec)

    def _rebind_first_stage(self) -> None:
        self.ld = self._ld_with_first_stage()

    def set_unet_options(self, **updates) -> None:
        """Swap parameter-free static UNet options at serving time —
        `tome_ratio`/`tome_min_tokens` (nn/tome.py) and `freeu`
        (arXiv:2309.11497). Params are untouched (both features are
        parameter-free); the per-(batch, steps, ...) program cache resets
        so the next generate() compiles the new graph.

            pipe.set_unet_options(tome_ratio=0.5, freeu=(1.2, 1.4, 0.9, 0.2))
        """
        import dataclasses as _dc

        from sd_tpu.diffusion.sag import make_probs_apply

        self.unet = self.unet.clone(**updates)
        unet = self.unet
        self.ld = _dc.replace(
            self.ld,
            unet_apply=lambda p, x, t, ctx, y=None: unet.apply(
                {"params": p}, x, t, ctx, y),
            unet_apply_probs=(make_probs_apply(unet)
                              if getattr(unet, "use_spatial_transformer",
                                         False) else None),
        )
        self._jitted = {}

    # -- constructors --------------------------------------------------------

    @classmethod
    def from_config(cls, path: str, **kw) -> "Text2ImagePipeline":
        from sd_tpu.core.config import load_yaml

        return cls(load_yaml(path), **kw)

    @classmethod
    def from_run(cls, config_path: str, run_dir: str,
                 **kw) -> "Text2ImagePipeline":
        """Load a trained run (scripts/train.py output directory) into the
        serving pipeline: EMA UNet weights from the latest Orbax checkpoint,
        the first stage from its configured ckpt (build_ldm restores it),
        and the persisted scale-factor calibration (calibration.json).

        The reference has no serving loader — sampling lives inside the
        Lightning modules (ldm/diffusion/ddpm.py:1742-1826); this is the
        deploy-a-training-run path.
        """
        import os

        from sd_tpu.core.config import load_yaml
        from sd_tpu.train.checkpoint import restore_pytree
        from sd_tpu.train.runners import apply_calibration

        cfg = load_yaml(config_path)
        dtype = kw.pop("param_dtype", jnp.bfloat16)
        pipe = cls(cfg, param_dtype=None, **kw)  # fp32 restore template

        ckpt_dir = os.path.join(run_dir, "ckpt")
        # raw-pytree restore: rebuilding the full TrainState (optimizer
        # moments + EMA) as a template would spike ~4× the param bytes in
        # HBM at serving-load time — fatal at the 859M-param flagship shape
        # staged on HOST: the flagship checkpoint is ~12 GB with Adam
        # moments + EMA; only the EMA subtree belongs in HBM at serving
        tree = restore_pytree(ckpt_dir, device="cpu")
        ema_t = tree.get("ema") if isinstance(tree, dict) else None
        uparams = (ema_t["shadow"]
                   if isinstance(ema_t, dict)
                   and ema_t.get("shadow") is not None
                   else tree["params"])
        pipe.unet_params = jax.device_put(
            jax.tree.map(lambda s, p: s.astype(p.dtype), uparams,
                         pipe.unet_params),
            jax.devices()[0])
        pipe.ld = apply_calibration(pipe.ld, cfg, ckpt_dir)

        if dtype is not None:
            cast = lambda t: jax.tree.map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
            pipe.unet_params = cast(pipe.unet_params)
            pipe.vae_params = cast(pipe.vae_params)
            pipe.clip.params = cast(pipe.clip.params)
            pipe.param_dtype = dtype
        return pipe

    @classmethod
    def from_sd_checkpoint(cls, config_path: str, ckpt_path: str,
                           **kw) -> "Text2ImagePipeline":
        """Load UNet+VAE weights from a Stable-Diffusion v1 .ckpt
        (CLIP text weights load separately via import_torch_clip_text when a
        HF checkpoint is available)."""
        from sd_tpu.models.sd_import import (
            import_sd_unet,
            import_sd_vae,
            load_sd_checkpoint,
        )

        pipe = cls.from_config(config_path, **kw)
        sd = load_sd_checkpoint(ckpt_path)
        ucfg = pipe.cfg["unet"]["params"]
        pipe.unet_params = import_sd_unet(
            jax.tree.map(np.asarray, pipe.unet_params), sd,
            channel_mult=tuple(ucfg.get("channel_mult", (1, 2, 4, 4))),
            num_res_blocks=ucfg.get("num_res_blocks", 2),
            attention_resolutions=tuple(
                ucfg.get("attention_resolutions", (4, 2, 1))),
            transformer_depth=ucfg.get("transformer_depth", 1),
        )
        fcfg = pipe.cfg["first_stage"]["params"]
        pipe.vae_params = import_sd_vae(
            jax.tree.map(np.asarray, pipe.vae_params), sd,
            ch_mult=tuple(fcfg.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=fcfg.get("num_res_blocks", 2),
            attn_resolutions=tuple(fcfg.get("attn_resolutions", ())),
            resolution=fcfg.get("resolution", 256),
        )
        if pipe.param_dtype is not None:
            cast = lambda t: jax.tree.map(
                lambda x: jnp.asarray(x, pipe.param_dtype)
                if np.issubdtype(np.asarray(x).dtype, np.floating)
                else jnp.asarray(x), t)
            pipe.unet_params = cast(pipe.unet_params)
            pipe.vae_params = cast(pipe.vae_params)
        return pipe

    def to_sd_checkpoint(self, path: str, half: bool = False) -> None:
        """Export the pipeline's UNet+VAE weights as a Stable-Diffusion v1
        torch .ckpt — the inverse of from_sd_checkpoint, so models trained
        or LoRA-merged here load back into any torch SD stack (including
        the reference's VAE/test/test.py:29-64 path)."""
        from sd_tpu.models.sd_export import (
            export_sd_unet,
            export_sd_vae,
            save_sd_checkpoint,
        )

        ucfg = self.cfg["unet"]["params"]
        sd = export_sd_unet(
            jax.tree.map(np.asarray, self.unet_params),
            channel_mult=tuple(ucfg.get("channel_mult", (1, 2, 4, 4))),
            num_res_blocks=ucfg.get("num_res_blocks", 2),
            attention_resolutions=tuple(
                ucfg.get("attention_resolutions", (4, 2, 1))),
            transformer_depth=ucfg.get("transformer_depth", 1),
        )
        fcfg = self.cfg["first_stage"]["params"]
        sd.update(export_sd_vae(
            jax.tree.map(np.asarray, self.vae_params),
            ch_mult=tuple(fcfg.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=fcfg.get("num_res_blocks", 2),
            attn_resolutions=tuple(fcfg.get("attn_resolutions", ())),
            resolution=fcfg.get("resolution", 256),
        ))
        save_sd_checkpoint(path, sd, half=half)

    # -- adapters ---------------------------------------------------------------

    def load_lora(self, lora, scale: float = 1.0) -> None:
        """Merge LoRA factors (train/lora.py) into the UNet weights for
        serving. `lora` is a factor tree, or a LoRA training run's ckpt
        directory — the EMA shadows are preferred when present. The merge
        happens once, host-side; the program cache resets."""
        from sd_tpu.train.lora import merge_lora

        if isinstance(lora, str) and lora.endswith(".safetensors"):
            from sd_tpu.train.lora import load_lora_safetensors

            lora = load_lora_safetensors(lora)
        elif isinstance(lora, str):
            from sd_tpu.train.checkpoint import restore_pytree

            tree = restore_pytree(lora)
            ema = tree.get("ema")
            lora = (ema["shadow"] if isinstance(ema, dict)
                    and ema.get("shadow") is not None else tree["params"])
        lora = jax.tree.map(
            lambda x: x.astype(self.param_dtype)
            if self.param_dtype is not None else x, lora)
        self.unet_params = merge_lora(self.unet_params, lora, scale)
        self._jitted = {}

    def load_ip_adapter(self, run_dir: str, ip_scale: float = 1.0) -> None:
        """Attach a trained IP-Adapter (models/ip_adapter.py,
        arXiv:2308.06721) for image-prompt generation. `run_dir` is the
        training-run directory (train_ldm with an `ip_adapter:` config
        block): the adapter tree loads from its ckpt (EMA preferred) and
        the FROZEN image embedder from its `ip_embedder` save, so serving
        embeds identically to training. Subsequent
        `generate(ip_image=...)` calls condition on the image; calls
        without one are bitwise-unchanged."""
        import os

        from sd_tpu.models.conditioners import FrozenClipImageEmbedder
        from sd_tpu.train.checkpoint import restore_pytree

        tree = restore_pytree(os.path.join(run_dir, "ckpt"))
        ema = tree.get("ema")
        ip = (ema["shadow"] if isinstance(ema, dict)
              and ema.get("shadow") is not None else tree["params"])
        if self.param_dtype is not None:
            ip = jax.tree.map(
                lambda x: x.astype(self.param_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, ip)
        self.ip_params = ip
        self.ip_scale = float(ip_scale)
        self._ip_embedder = FrozenClipImageEmbedder()
        self._ip_embedder_params = restore_pytree(
            os.path.join(run_dir, "ip_embedder"))
        self._jitted = {}

    def load_controlnet(self, source, control_scale: float = 1.0) -> None:
        """Attach a trained ControlNet branch (models/controlnet.py,
        arXiv:2302.05543) for structure-guided generation. `source` is a
        training-run directory (train_ldm with a `controlnet:` config
        block — EMA weights preferred), its ckpt subdirectory, or a raw
        param tree. Subsequent `generate(control_image=...)` calls run
        the controlled UNet; calls without a control image are unchanged.
        """
        import os

        from sd_tpu.models.controlnet import controlnet_from_unet_config

        f_vae = self._vae_factor()
        self.controlnet = controlnet_from_unet_config(
            self.cfg["unet"]["params"],
            hint_downsamples=f_vae.bit_length() - 1, dtype=self.param_dtype)
        if isinstance(source, str):
            from sd_tpu.train.checkpoint import restore_pytree

            if os.path.isdir(os.path.join(source, "ckpt")):
                source = os.path.join(source, "ckpt")
            tree = restore_pytree(source)
            ema = tree.get("ema")
            source = (ema["shadow"] if isinstance(ema, dict)
                      and ema.get("shadow") is not None else tree["params"])
        if self.param_dtype is not None:
            source = jax.tree.map(
                lambda x: x.astype(self.param_dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, source)
        self.cn_params = source
        self.control_scale = float(control_scale)
        self._jitted = {}

    # -- multi-chip serving ----------------------------------------------------

    def shard_for_serving(self, mesh=None) -> None:
        """Place the weights for multi-chip serving over a `jax.sharding.Mesh`
        (TPU-native scaling surface — SURVEY.md §2.14/§5.8; the reference is
        single-GPU, VAE/autoencoder.py:463-471).

        * data axis ("data"): the prompt batch shards across chips —
          embarrassingly-parallel serving throughput over ICI.
        * optional model axis ("model", size >1): the UNet weights shard by
          the Megatron TP rules (parallel/mesh.py TP_RULES_UNET); GSPMD
          inserts the ICI collectives inside the jitted program.

        Weights are device_put NOW (replicated or TP-sharded); the program
        cache resets so subsequent `generate` calls compile against the mesh.
        Batch sizes must divide the data-axis size.
        """
        from sd_tpu.parallel import mesh as pm

        m = mesh if mesh is not None else pm.make_mesh()
        self.mesh = m
        axis_sizes = dict(zip(m.axis_names, m.devices.shape))
        if axis_sizes.get("model", 1) > 1:
            shardings = pm.infer_param_sharding(self.unet_params, m,
                                                pm.TP_RULES_UNET)
            self.unet_params = pm.put_sharded_params(self.unet_params,
                                                     shardings)
        else:
            self.unet_params = pm.put_replicated(self.unet_params, m)
        self.vae_params = pm.put_replicated(self.vae_params, m)
        self.clip.params = pm.put_replicated(self.clip.params, m)
        self._jitted = {}

    def _place_inputs(self, ids, neg, rng):
        """Shard the prompt batch on the data axis, replicate the rng."""
        from sd_tpu.parallel.mesh import replicated, shard_batch

        if self.mesh is None:
            return ids, neg, rng
        n_data = dict(zip(self.mesh.axis_names,
                          self.mesh.devices.shape)).get("data", 1)
        if ids.shape[0] % n_data != 0:
            raise ValueError(
                f"batch {ids.shape[0]} must divide the data axis ({n_data})")
        ids, neg = shard_batch(self.mesh, (ids, neg))
        rng = jax.device_put(rng, replicated(self.mesh))
        return ids, neg, rng

    # -- generation -----------------------------------------------------------

    def load_textual_inversion(self, path: str) -> list[str]:
        """Load learned concept embeddings (textual inversion,
        arXiv:2208.01618) from a `.safetensors` embedding file written by
        `sd_tpu.train.textual_inversion` ({placeholder: [num_vectors, C]}).
        The placeholder's token rows are patched into the text encoder and
        multi-vector placeholders expand transparently in prompts. Returns
        the loaded placeholder tokens."""
        from sd_tpu.train.textual_inversion import (
            expand_placeholder,
            patch_embedding_rows,
            placeholder_ids,
        )
        from sd_tpu.utils.safetensors_io import load_safetensors

        tensors = load_safetensors(path)
        loaded = []
        for token, vec in tensors.items():
            vec = np.asarray(vec, np.float32)
            if vec.ndim == 1:
                vec = vec[None]
            ids = placeholder_ids(self.clip.tokenize, token, vec.shape[0])
            if vec.shape[1] != self.clip.cfg.hidden_size:
                raise ValueError(
                    f"{token}: embedding dim {vec.shape[1]} != text encoder "
                    f"hidden size {self.clip.cfg.hidden_size}")
            self.clip.params = patch_embedding_rows(self.clip.params, ids, vec)
            self._ti_expansions[token] = " ".join(
                expand_placeholder(token, vec.shape[0]))
            loaded.append(token)
        if self.mesh is not None:  # keep serving placement (replicated)
            from sd_tpu.parallel.mesh import replicated

            self.clip.params = jax.device_put(self.clip.params,
                                              replicated(self.mesh))
        return loaded

    def _tokenize_weighted(self, texts: list[str]):
        if self._ti_expansions:
            texts = [t for t in texts]
            for token, phrase in self._ti_expansions.items():
                texts = [t.replace(token, phrase) for t in texts]
        """Tokenize with prompt-attention weighting. Prompts without
        emphasis markers take the plain tokenizer path with all-ones
        weights (apply_prompt_weights is an exact no-op there), so plain
        prompts stay bitwise-identical to the unweighted pipeline."""
        from sd_tpu.utils.prompt_weights import (
            parse_weighted_prompt,
            tokenize_weighted,
        )

        tok = self.clip.tokenize
        parsed = [parse_weighted_prompt(t) for t in texts]
        trivial = all(len(p) == 1 and p[0][1] == 1.0 for p in parsed)
        if trivial or not hasattr(tok, "encode_chunk"):
            ids = np.asarray(tok(texts))
            return jnp.asarray(ids), jnp.ones(ids.shape, jnp.float32)
        ids, wts = tokenize_weighted(
            texts, tok.encode_chunk, self.clip.cfg.max_length,
            tok.bos_token_id, tok.eos_token_id)
        return jnp.asarray(ids), jnp.asarray(wts)

    def _place_batched(self, *arrays):
        """Shard additional per-batch arrays on the data axis (the
        companion to _place_inputs for inputs beyond ids/neg/rng)."""
        if self.mesh is None:
            return arrays
        from sd_tpu.parallel.mesh import shard_batch

        return shard_batch(self.mesh, arrays)

    def _latent_hw(self, height: int | None, width: int | None):
        """Pixel height/width → latent grid, validated against the model's
        total downsampling (VAE factor × UNet down levels)."""
        lat = self.cfg["latent"]
        if height is None and width is None:
            return lat["image_size"], lat["image_size"]
        f_vae = 2 ** (len(self.cfg["first_stage"]["params"]
                          .get("ch_mult", (1, 2, 4, 4))) - 1)
        f_unet = 2 ** (len(self.cfg["unet"]["params"]
                           .get("channel_mult", (1, 2, 4, 4))) - 1)
        f = f_vae * f_unet
        height = height if height is not None else lat["image_size"] * f_vae
        width = width if width is not None else lat["image_size"] * f_vae
        if height % f or width % f:
            raise ValueError(
                f"height/width must be multiples of {f} "
                f"(VAE f{f_vae} × UNet {f_unet}-level downsampling)")
        return height // f_vae, width // f_vae

    def _vae_factor(self) -> int:
        return 2 ** (len(self.cfg["first_stage"]["params"]
                         .get("ch_mult", (1, 2, 4, 4))) - 1)

    def _decode(self, vae_params, z, tile: int | None = None):
        """VAE decode, optionally tiled: ks×ks latent patches with
        border-falloff overlap-add (the reference's patched
        decode_first_stage, ldm/diffusion/ddpm.py:1097-1139) so very large
        images decode within fixed VMEM/HBM. Seam behavior matches the
        community 'VAE tiling': per-tile GroupNorm stats differ slightly
        from a whole-image decode; the Gaussian overlap weighting hides
        the seams."""
        from sd_tpu.models.autoencoder import AutoencoderKL

        def dec(zp):
            return self.vae.apply({"params": vae_params}, zp,
                                  method=AutoencoderKL.decode)

        B, H, W, C = z.shape
        if tile is None or (H <= tile and W <= tile):
            return dec(z)
        from sd_tpu.diffusion.latent import patched_apply

        ks = min(tile, H, W)
        # largest stride <= 3*ks//4 that exactly covers both dims: latent
        # dims are multiples of the UNet factor, so a common divisor exists
        stride = self._cover_stride(ks, H, W)
        return patched_apply(dec, z, ks=ks, stride=stride,
                             scale=self._vae_factor())

    @staticmethod
    def _cover_stride(ks: int, H: int, W: int, step: int = 1) -> int:
        """Largest stride ≤ 3·ks/4 (a multiple of `step`) that exactly
        covers both dims, falling back to ks."""
        for s in range((min(3 * ks // 4, ks - 1) // step) * step, 0, -step):
            if (H - ks) % s == 0 and (W - ks) % s == 0:
                return s
        return ks

    def _encode_raw(self, ld, x, rng, tile: int | None = None):
        """First-stage encode (pre scale_factor), optionally tiled:
        `tile`×`tile` PIXEL patches encoded as one vmapped computation and
        overlap-added at the latent grid (the encode twin of `_decode`'s
        tiling; reference analog: patched encode_first_stage,
        ldm/diffusion/ddpm.py:1239-1272). Bounds encoder memory for very
        large img2img/inpaint inputs."""
        B, H, W, C = x.shape
        if tile is None or (H <= tile and W <= tile):
            return ld.encode_first_stage(x, rng)
        from sd_tpu.diffusion.latent import patched_apply

        f = self._vae_factor()
        ks = max(f, (min(tile, H, W) // f) * f)
        stride = self._cover_stride(ks, H, W, step=f)
        return patched_apply(lambda xp: ld.encode_fn(xp, rng), x,
                             ks=ks, stride=stride)

    def _program(self, batch: int, steps: int, guidance_scale: float,
                 eta: float, sampler: str = "ddim",
                 guidance_rescale: float = 0.0,
                 latent_hw: tuple[int, int] | None = None,
                 clip_skip: int | None = None,
                 vae_tile: int | None = None,
                 controlled: bool = False,
                 sag_scale: float = 0.0,
                 use_ip: bool = False):
        lat = self.cfg["latent"]
        if latent_hw is None:
            latent_hw = (lat["image_size"], lat["image_size"])
        key = (batch, steps, guidance_scale, eta, sampler, guidance_rescale,
               latent_hw, clip_skip, vae_tile,
               (self.control_scale if controlled else None), sag_scale,
               (self.ip_scale if use_ip else None))
        if key in self._jitted:
            return self._jitted[key]

        shape = (batch, latent_hw[0], latent_hw[1], lat["channels"])

        def program(unet_params, vae_params, clip_params, ids, neg_ids,
                    wts, neg_wts, rng, cn_params=None, hint=None,
                    ip_params=None, ip_embed=None):
            from sd_tpu.utils.prompt_weights import apply_prompt_weights

            c = self.clip.encode(clip_params, ids, clip_skip=clip_skip)
            uc = self.clip.encode(clip_params, neg_ids, clip_skip=clip_skip)
            c = apply_prompt_weights(c, wts)
            uc = apply_prompt_weights(uc, neg_wts)
            if self.param_dtype is not None:
                c, uc = c.astype(self.param_dtype), uc.astype(self.param_dtype)
            ld = self.ld
            cond = {"c_crossattn": [c]}
            uncond = {"c_crossattn": [uc]}
            params = unet_params
            if controlled:
                # controlled UNet: residuals from the control branch enter
                # both CFG passes (models/controlnet.py)
                import dataclasses as _dc

                from sd_tpu.models.controlnet import controlled_apply_fn

                ld = _dc.replace(ld, unet_apply=controlled_apply_fn(
                    self.unet, self.controlnet, self.control_scale))
                params = {"unet": unet_params, "controlnet": cn_params}
                cond["c_control"] = hint
                uncond["c_control"] = hint
            if use_ip:
                # IP-Adapter image prompt: the unconditional CFG branch gets
                # the ZERO embedding — the image-free state the adapter was
                # trained with at `image_dropout` (models/ip_adapter.py)
                import dataclasses as _dc

                from sd_tpu.models.ip_adapter import ip_apply_fn

                ld = _dc.replace(ld, unet_apply=ip_apply_fn(
                    self.unet, self.ip_scale))
                params = {"unet": unet_params, "ip": ip_params}
                cond["c_ip"] = ip_embed
                uncond["c_ip"] = jnp.zeros_like(ip_embed)
            z = ld.sample(
                params, rng, shape,
                cond=cond, uncond=uncond,
                guidance_scale=guidance_scale, num_steps=steps,
                sampler=sampler, decode=False,
                guidance_rescale=guidance_rescale,
                sag_scale=sag_scale,
                **({"eta": eta} if sampler == "ddim" else {}),
            )
            img = self._decode(
                vae_params, (z / ld.scale_factor).astype(z.dtype),
                tile=vae_tile)
            return img

        fn = jax.jit(program)
        self._jitted[key] = fn
        return fn

    def generate(
        self,
        prompts: Sequence[str],
        negative_prompt: str | Sequence[str] = "",
        num_steps: int = 50,
        guidance_scale: float = 7.5,
        eta: float = 0.0,
        seed: int = 0,
        sampler: str = "ddim",
        guidance_rescale: float = 0.0,
        height: int | None = None,
        width: int | None = None,
        clip_skip: int | None = None,
        decode_tile: int | None = None,
        control_image=None,
        sag_scale: float = 0.0,
        ip_image=None,
        watermark: str | None = None,
        watermark_bits: int = 48,
        watermark_key: int = 0,
    ) -> np.ndarray:
        """prompts → uint8 images [B, H, W, 3]. sampler: "ddim", "dpm"
        (DPM-Solver++(2M): ~15 steps ≈ DDIM-50 quality), "dpm_sde"
        (DPM++ 2M SDE — the stochastic variant; fresh noise each step,
        more sample diversity at fixed seed count), "unipc"
        (predictor-corrector, arXiv:2302.04867 — reuses each model call to
        correct the previous step; best quality per call at 5-10 steps),
        "plms" (4th-order pseudo linear multistep), or the k-diffusion family
        "euler" / "euler_a" (stochastic) / "heun" (2nd order, 2 model
        calls/step). guidance_rescale: std-rescale
        of the CFG output (arXiv:2305.08891; ~0.7 fixes over-exposure at
        high guidance, most useful with v-prediction models).
        height/width: output size in pixels (default: the config's square
        size). The UNet and VAE are fully convolutional, so any multiple of
        the total downsampling factor (64 px for SD v1) compiles its own
        cached program — the standard SD portrait/landscape surface.
        negative_prompt: one string for the whole batch or one per prompt.
        clip_skip: condition on an earlier CLIP hidden state (the community
        knob: 2 = penultimate + final LN; default = the model config's
        setting, 1 for SD v1).
        Prompts (and negatives) support attention-weighting syntax —
        `(emphasis)`, `(word:1.3)`, `[de-emphasis]`, `\\(` literals
        (sd_tpu.utils.prompt_weights); plain prompts are bitwise-unchanged.
        decode_tile: tiled VAE decode for very large images — tile size in
        PIXELS (e.g. 512); latents decode as overlapping patches with
        Gaussian overlap-add, bounding decoder memory at any resolution.
        control_image: ControlNet hint (after load_controlnet) — the
        pixel-resolution conditioning map ([B?, H, W, C] uint8 or float
        [0,1], e.g. sd_tpu.data.hints.edge_hint output); structure-guided
        generation per arXiv:2302.05543.
        sag_scale: Self-Attention Guidance strength (arXiv:2210.00939;
        diffusion/sag.py — typical 0.5-0.75). Parameter-free sharpness/
        detail knob: +1 UNet forward per step; "ddim" sampler only."""
        if sag_scale > 0.0 and control_image is not None:
            raise ValueError("sag_scale and control_image cannot combine: "
                             "the SAG probe pass has no control branch")
        if ip_image is not None and control_image is not None:
            raise ValueError("ip_image and control_image cannot combine "
                             "(one params wrapper each); pick one")
        use_ip = ip_image is not None
        ip_embed = None
        if use_ip:
            if self.ip_params is None:
                raise ValueError("call load_ip_adapter() before passing "
                                 "ip_image")
            x = self._to_model_range(ip_image)
            if x.ndim == 3:
                x = x[None]
            if x.shape[0] == 1 and len(prompts) > 1:
                x = jnp.broadcast_to(x, (len(prompts),) + x.shape[1:])
            if not hasattr(self, "_ip_embed_fn"):
                self._ip_embed_fn = jax.jit(
                    lambda p, img: self._ip_embedder.apply({"params": p},
                                                           img))
            ip_embed = self._ip_embed_fn(self._ip_embedder_params, x)
            if self.param_dtype is not None:
                ip_embed = ip_embed.astype(self.param_dtype)
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * len(prompts)
        elif len(negative_prompt) != len(prompts):
            raise ValueError("negative_prompt list must match prompts length")
        controlled = control_image is not None
        hint = None
        if controlled:
            if self.controlnet is None:
                raise ValueError("call load_controlnet() before passing "
                                 "control_image")
            hint = np.asarray(control_image)
            if hint.dtype == np.uint8:
                hint = hint.astype(np.float32) / 255.0
            hint = hint.astype(np.float32)
            if hint.ndim == 3:
                hint = np.broadcast_to(hint[None],
                                       (len(prompts),) + hint.shape)
            lh, lw = self._latent_hw(height, width)
            f = self._vae_factor()
            if hint.shape[1:3] != (lh * f, lw * f):
                raise ValueError(
                    f"control_image must be {(lh * f, lw * f)} pixels, "
                    f"got {hint.shape[1:3]}")
            hint = jnp.asarray(hint)
        ids, wts = self._tokenize_weighted(list(prompts))
        neg, neg_wts = self._tokenize_weighted(list(negative_prompt))
        fn = self._program(len(prompts), num_steps, guidance_scale, eta,
                           sampler, guidance_rescale,
                           latent_hw=self._latent_hw(height, width),
                           clip_skip=clip_skip,
                           vae_tile=(None if decode_tile is None
                                     else max(1, decode_tile
                                              // self._vae_factor())),
                           controlled=controlled, sag_scale=sag_scale,
                           use_ip=use_ip)
        ids, neg, rng = self._place_inputs(ids, neg, jax.random.PRNGKey(seed))
        wts, neg_wts = self._place_batched(wts, neg_wts)
        if controlled:
            (hint,) = self._place_batched(hint)
            img = fn(self.unet_params, self.vae_params, self.clip.params,
                     ids, neg, wts, neg_wts, rng,
                     cn_params=self.cn_params, hint=hint)
        elif use_ip:
            (ip_embed,) = self._place_batched(ip_embed)
            img = fn(self.unet_params, self.vae_params, self.clip.params,
                     ids, neg, wts, neg_wts, rng,
                     ip_params=self.ip_params, ip_embed=ip_embed)
        else:
            img = fn(self.unet_params, self.vae_params, self.clip.params,
                     ids, neg, wts, neg_wts, rng)
        img = np.asarray(img.astype(jnp.float32))
        out = np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)
        if watermark is not None:
            # blind invisible DCT watermark (utils/watermark.py) — the
            # production-serving provenance mark; host-side post-decode
            from sd_tpu.utils.watermark import embed_watermark, str_to_bits

            bits = str_to_bits(watermark, watermark_bits)
            out = np.stack([embed_watermark(o, bits, key=watermark_key)
                            for o in out])
        return out

    # -- img2img / inpainting --------------------------------------------------

    @staticmethod
    def _to_model_range(images) -> jnp.ndarray:
        """uint8 [0,255] or float [-1,1] NHWC → float32 [-1,1]."""
        x = np.asarray(images)
        if x.dtype == np.uint8:
            x = x.astype(np.float32) / 127.5 - 1.0
        return jnp.asarray(x, jnp.float32)

    def _img2img_program(self, batch: int, steps: int, guidance_scale: float,
                         t_start: int, masked: bool,
                         guidance_rescale: float,
                         clip_skip: int | None = None,
                         enc_tile: int | None = None,
                         vae_tile: int | None = None):
        key = ("i2i", batch, steps, guidance_scale, t_start, masked,
               guidance_rescale, clip_skip, enc_tile, vae_tile)
        if key in self._jitted:
            return self._jitted[key]

        from sd_tpu.diffusion.ddim import DDIMSampler

        ld = self.ld
        sampler = DDIMSampler(ld.schedule,
                              parameterization=ld.process.parameterization)
        dd = sampler.make_schedule(steps)

        def program(unet_params, vae_params, clip_params, x, ids, neg_ids,
                    wts, neg_wts, mask, rng):
            from sd_tpu.utils.prompt_weights import apply_prompt_weights

            ld = self._ld_with_first_stage(vae_params)
            c = self.clip.encode(clip_params, ids, clip_skip=clip_skip)
            uc = self.clip.encode(clip_params, neg_ids, clip_skip=clip_skip)
            c = apply_prompt_weights(c, wts)
            uc = apply_prompt_weights(uc, neg_wts)
            if self.param_dtype is not None:
                c, uc = c.astype(self.param_dtype), uc.astype(self.param_dtype)
            cond = {"c_crossattn": [c]}
            uncond = {"c_crossattn": [uc]}
            r_enc, r_noise, r_dec = jax.random.split(rng, 3)
            z = ld.get_first_stage_encoding(
                self._encode_raw(ld, x, r_enc, enc_tile))
            z_noisy = sampler.stochastic_encode(
                z, jnp.asarray(t_start - 1), r_noise, dd)
            model_fn = ld.model_fn(unet_params)
            if masked:
                z_out = sampler.sample(
                    model_fn, r_dec, z.shape, num_steps=steps, cond=cond,
                    uncond=uncond, guidance_scale=guidance_scale,
                    x_T=z_noisy, mask=mask, x0=z, dd=dd,
                    guidance_rescale=guidance_rescale)
            else:
                z_out = sampler.decode(
                    model_fn, z_noisy, t_start, r_dec, cond=cond,
                    uncond=uncond, guidance_scale=guidance_scale, dd=dd)
            return self._decode(
                vae_params, (z_out / ld.scale_factor).astype(z_out.dtype),
                tile=vae_tile)

        fn = jax.jit(program)
        self._jitted[key] = fn
        return fn

    def img2img(
        self,
        prompts: Sequence[str],
        init_images,
        strength: float = 0.75,
        negative_prompt: str | Sequence[str] = "",
        num_steps: int = 50,
        guidance_scale: float = 7.5,
        seed: int = 0,
        mask=None,
        guidance_rescale: float = 0.0,
        clip_skip: int | None = None,
        encode_tile: int | None = None,
        decode_tile: int | None = None,
    ) -> np.ndarray:
        """Guided image-to-image (reference: DDIM/ddim.py:206-241
        stochastic_encode/decode): re-noise the init image's latent to
        `strength`·steps, then CFG-guided DDIM decode. With `mask`
        (white/1 = keep, image- or latent-resolution), runs the inpainting
        blend instead (reference mask path: DDIM/ddim.py:144-147).

        init_images: [B, H, W, 3] uint8 or float in [-1, 1], H = the
        pixel resolution of the first stage.

        encode_tile/decode_tile: tiled first-stage encode/decode for very
        large inputs — tile size in PIXELS; patches run as one vmapped
        computation with Gaussian overlap-add, bounding VAE memory at any
        resolution (see generate()'s decode_tile)."""
        x = self._to_model_range(init_images)
        b = x.shape[0]
        assert len(prompts) == b, (len(prompts), b)
        t_start = max(1, min(int(strength * num_steps), num_steps))

        lat_hw = None
        m = None
        if mask is not None:
            lat = self.cfg["latent"]
            lat_hw = (lat["image_size"], lat["image_size"])
            m = np.asarray(mask, np.float32)
            if m.ndim == 2:
                m = m[None]
            if m.ndim == 3:
                m = m[..., None]
            if m.max() > 1.0:
                m = m / 255.0
            if m.shape[1:3] != lat_hw:  # nearest-downsample to latent res
                sy = m.shape[1] // lat_hw[0]
                sx = m.shape[2] // lat_hw[1]
                m = m[:, ::sy, :: sx][:, : lat_hw[0], : lat_hw[1]]
            m = jnp.asarray((m > 0.5).astype(np.float32))

        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * b
        elif len(negative_prompt) != b:
            raise ValueError("negative_prompt list must match prompts length")
        ids, wts = self._tokenize_weighted(list(prompts))
        neg, neg_wts = self._tokenize_weighted(list(negative_prompt))
        f = self._vae_factor()
        fn = self._img2img_program(b, num_steps, guidance_scale, t_start,
                                   mask is not None, guidance_rescale,
                                   clip_skip=clip_skip,
                                   enc_tile=encode_tile,
                                   vae_tile=(None if decode_tile is None
                                             else max(1, decode_tile // f)))
        img = fn(self.unet_params, self.vae_params, self.clip.params,
                 x, ids, neg, wts, neg_wts, m, jax.random.PRNGKey(seed))
        img = np.asarray(img.astype(jnp.float32))
        return np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)

    def generate_hires(
        self,
        prompts: Sequence[str],
        hires_scale: float = 2.0,
        denoising_strength: float = 0.7,
        num_steps: int = 50,
        hires_steps: int | None = None,
        negative_prompt: str | Sequence[str] = "",
        guidance_scale: float = 7.5,
        seed: int = 0,
        height: int | None = None,
        width: int | None = None,
        clip_skip: int | None = None,
        guidance_rescale: float = 0.0,
        upscale: str = "bicubic",
    ) -> np.ndarray:
        """Two-stage "highres fix": txt2img at the base resolution, upscale
        `hires_scale`×, then an img2img refinement pass at the target
        resolution with `denoising_strength`. Generating directly above the
        training resolution duplicates subjects (the SD failure mode this
        works around); composing the two existing jitted programs keeps
        global structure from the base pass and lets the refinement pass
        add detail. upscale: "bicubic" | "nearest" | "lanczos" host-side
        between the stages. The target size snaps to the model's total
        downsampling factor."""
        from PIL import Image

        base = self.generate(
            prompts, negative_prompt=negative_prompt, num_steps=num_steps,
            guidance_scale=guidance_scale, seed=seed, height=height,
            width=width, clip_skip=clip_skip,
            guidance_rescale=guidance_rescale)
        f = self._vae_factor() * 2 ** (
            len(self.cfg["unet"]["params"].get("channel_mult",
                                               (1, 2, 4, 4))) - 1)
        h2 = max(f, round(base.shape[1] * hires_scale / f) * f)
        w2 = max(f, round(base.shape[2] * hires_scale / f) * f)
        resample = {"bicubic": Image.BICUBIC, "nearest": Image.NEAREST,
                    "lanczos": Image.LANCZOS}[upscale]
        up = np.stack([
            np.asarray(Image.fromarray(im).resize((w2, h2), resample))
            for im in base])
        return self.img2img(
            prompts, up, strength=denoising_strength,
            negative_prompt=negative_prompt,
            num_steps=hires_steps or num_steps,
            guidance_scale=guidance_scale, seed=seed + 1,
            clip_skip=clip_skip, guidance_rescale=guidance_rescale)

    def inpaint(self, prompts: Sequence[str], init_images, mask,
                **kw) -> np.ndarray:
        """Inpainting (white/1 mask pixels are KEPT, the rest is
        regenerated under the prompt).

        With a mask-CONDITIONED model (the SD-inpainting layout:
        `latent.conditioning_key: hybrid`, `unet.in_channels = 2·z + 1` —
        train with `task: ldm_inpaint`), the UNet sees
        [z_t | hole-mask↓ | E(masked image)] every step and generates
        hole content aware of the visible context; the result is
        composited back into the original at pixel level.

        Otherwise falls back to sampling-time mask-blend img2img
        (reference mask path: DDIM/ddim.py:144-147) at full-schedule
        strength."""
        if self._is_inpaint_model():
            return self._inpaint_conditioned(prompts, init_images, mask,
                                             **kw)
        kw.setdefault("strength", 1.0)
        return self.img2img(prompts, init_images, mask=mask, **kw)

    def _is_inpaint_model(self) -> bool:
        lat = self.cfg["latent"]
        want = 2 * lat["channels"] + 1
        got = self.cfg["unet"].get("params", {}).get("in_channels",
                                                     lat["channels"])
        return (lat.get("conditioning_key") == "hybrid" and got == want)

    def _normalize_keep_mask(self, mask, b: int, h: int, w: int):
        """Public keep-mask (white/1 = keep) → pixel-res hole mask
        [B,H,W,1] float32 in {0,1} (1 = regenerate)."""
        m = np.asarray(mask, np.float32)
        if m.ndim == 2:
            m = m[None]
        if m.ndim == 3:
            m = m[..., None]
        if m.shape[0] == 1 and b > 1:
            m = np.broadcast_to(m, (b,) + m.shape[1:])
        if m.max() > 1.0:
            m = m / 255.0
        if m.shape[1:3] != (h, w):
            raise ValueError(f"mask must be image-resolution {(h, w)}, "
                             f"got {m.shape[1:3]}")
        return (m <= 0.5).astype(np.float32)  # keep→0, hole→1

    def _inpaint_program(self, batch: int, steps: int, guidance_scale: float,
                         eta: float, sampler: str, guidance_rescale: float,
                         latent_hw: tuple[int, int],
                         clip_skip: int | None = None):
        key = ("inp", batch, steps, guidance_scale, eta, sampler,
               guidance_rescale, latent_hw, clip_skip)
        if key in self._jitted:
            return self._jitted[key]

        ld = self.ld
        lh, lw = latent_hw
        ch = self.cfg["latent"]["channels"]

        def program(unet_params, vae_params, clip_params, x, hole, ids,
                    neg_ids, wts, neg_wts, rng):
            from sd_tpu.train.inpaint import inpaint_concat_cond
            from sd_tpu.utils.prompt_weights import apply_prompt_weights

            ld = self._ld_with_first_stage(vae_params)
            c = self.clip.encode(clip_params, ids, clip_skip=clip_skip)
            uc = self.clip.encode(clip_params, neg_ids, clip_skip=clip_skip)
            c = apply_prompt_weights(c, wts)
            uc = apply_prompt_weights(uc, neg_wts)
            if self.param_dtype is not None:
                c = c.astype(self.param_dtype)
                uc = uc.astype(self.param_dtype)
            r_enc, r_sample = jax.random.split(rng)
            cc = inpaint_concat_cond(ld, x, hole, r_enc, lh, lw)
            # the concat conditioning rides BOTH CFG branches (the
            # diffusers/SD-inpainting convention: only the text differs)
            cond = {"c_crossattn": [c], "c_concat": [cc]}
            uncond = {"c_crossattn": [uc], "c_concat": [cc]}
            z = ld.sample(
                unet_params, r_sample, (batch, lh, lw, ch), cond=cond,
                uncond=(uncond if guidance_scale > 1.0 else None),
                guidance_scale=guidance_scale, num_steps=steps, eta=eta,
                sampler=sampler, guidance_rescale=guidance_rescale,
                decode=False)
            img = ld.decode_first_stage(z)
            # pixel-level composite: generated content in the hole only
            return img * hole + x * (1.0 - hole)

        fn = jax.jit(program)
        self._jitted[key] = fn
        return fn

    def _inpaint_conditioned(
        self, prompts: Sequence[str], init_images, mask,
        negative_prompt: str | Sequence[str] = "",
        num_steps: int = 50, guidance_scale: float = 7.5,
        eta: float = 0.0, seed: int = 0, sampler: str = "ddim",
        guidance_rescale: float = 0.0, clip_skip: int | None = None,
    ) -> np.ndarray:
        x = self._to_model_range(init_images)
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        assert len(prompts) == b, (len(prompts), b)
        f = self._vae_factor()
        if h % f or w % f:
            raise ValueError(f"init image size must be a multiple of {f}")
        hole = jnp.asarray(self._normalize_keep_mask(mask, b, h, w))
        if isinstance(negative_prompt, str):
            negative_prompt = [negative_prompt] * b
        elif len(negative_prompt) != b:
            raise ValueError("negative_prompt list must match prompts length")
        ids, wts = self._tokenize_weighted(list(prompts))
        neg, neg_wts = self._tokenize_weighted(list(negative_prompt))
        fn = self._inpaint_program(b, num_steps, guidance_scale, eta,
                                   sampler, guidance_rescale,
                                   latent_hw=(h // f, w // f),
                                   clip_skip=clip_skip)
        img = fn(self.unet_params, self.vae_params, self.clip.params,
                 x, hole, ids, neg, wts, neg_wts, jax.random.PRNGKey(seed))
        img = np.asarray(img.astype(jnp.float32))
        out = np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)
        # host-side uint8 composite so kept pixels are BIT-preserved (the
        # fp32 [-1,1] round trip + truncating cast is ±1 on its own); rint
        # recovers the original uint8 exactly (round-trip error < 0.5)
        orig = np.clip(np.rint((np.asarray(x, np.float32) + 1.0) * 127.5),
                       0, 255).astype(np.uint8)
        keep = ~np.asarray(hole).astype(bool)
        return np.where(np.broadcast_to(keep, out.shape), orig, out)
