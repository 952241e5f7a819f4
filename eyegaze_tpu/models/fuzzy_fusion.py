"""FuzzyGatingFusion (UDF-Fusion): uncertainty-aware differentiable fuzzy fusion.

Pure-jnp rebuild of ``3_Models/fusion/fuzzy_gating_fusion.py:23-428`` — fully
elementwise, so it jits trivially and fuses into the surrounding graph.

6 stages: (1) learnable softplus temperature scaling (init T_img=1.5,
T_eeg=1.0), (2) Shannon entropy, (3) Gaussian-membership fuzzification
(c_reliable fixed at 0; learnable c_unreliable/log-sigmas), (4) 4 fuzzy rules
with product T-norm, (5) defuzzification = firing-strength-weighted average of
sigmoid(beta) consequents, (6) fused = alpha*z_img + (1-alpha)*z_eeg.

Ablation modes: 'full' | 'no_temperature' | 'no_fuzzification' | 'fixed_weights'.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

VALID_MODES = ("full", "no_temperature", "no_fuzzification", "fixed_weights")


def inverse_softplus(x: float) -> float:
    """log(exp(x) - 1), the inverse of softplus (fuzzy_gating_fusion.py:16-21)."""
    if x <= 0:
        raise ValueError("inverse_softplus requires x > 0")
    return math.log(math.expm1(x))


def _entropy(logits: jnp.ndarray, eps: float) -> jnp.ndarray:
    probs = jax.nn.softmax(logits, axis=-1)
    return -jnp.sum(probs * jnp.log(probs + eps), axis=-1)


class FuzzyGatingFusion(nn.Module):
    num_classes: int = 3
    mode: str = "full"
    eps_temp: float = 0.1
    eps_log: float = 1e-8
    eps_div: float = 1e-8

    def setup(self):
        if self.mode not in VALID_MODES:
            raise ValueError(f"Invalid mode {self.mode!r}; must be one of {VALID_MODES}")
        max_entropy = math.log(self.num_classes)
        init = lambda v: (lambda key: jnp.asarray(v, jnp.float32))
        self.tau_img = self.param("tau_img", init(inverse_softplus(1.5 - self.eps_temp)))
        self.tau_eeg = self.param("tau_eeg", init(inverse_softplus(1.0 - self.eps_temp)))
        c_unrel = max_entropy * 0.8
        self.c_unreliable_img = self.param("c_unreliable_img", init(c_unrel))
        self.c_unreliable_eeg = self.param("c_unreliable_eeg", init(c_unrel))
        log_sigma = math.log(max_entropy * 0.3)
        self.log_sigma_reliable_img = self.param("log_sigma_reliable_img", init(log_sigma))
        self.log_sigma_reliable_eeg = self.param("log_sigma_reliable_eeg", init(log_sigma))
        self.log_sigma_unreliable_img = self.param("log_sigma_unreliable_img", init(log_sigma))
        self.log_sigma_unreliable_eeg = self.param("log_sigma_unreliable_eeg", init(log_sigma))
        # Rule consequents: R1 favor img (0.8), R2 favor eeg (0.2),
        # R3 slight img preference (0.6), R4 equal (0.5).
        self.beta = self.param(
            "beta",
            lambda key: jnp.asarray(
                [math.log(0.8 / 0.2), math.log(0.2 / 0.8), math.log(0.6 / 0.4), 0.0],
                jnp.float32,
            ),
        )
        self.max_entropy = max_entropy

    @property
    def temp_img(self):
        return jax.nn.softplus(self.tau_img) + self.eps_temp

    @property
    def temp_eeg(self):
        return jax.nn.softplus(self.tau_eeg) + self.eps_temp

    def _gaussian_membership(self, x, center, log_sigma):
        sigma = jnp.exp(log_sigma)
        return jnp.exp(-((x - center) ** 2) / (2 * sigma**2 + self.eps_div))

    def __call__(self, img_logits: jnp.ndarray, eeg_logits: jnp.ndarray):
        """Returns (fused_logits (B,C), alpha (B,), aux_info dict)."""
        b = img_logits.shape[0]
        aux = {}

        if self.mode in ("no_temperature", "fixed_weights"):
            t_img = jnp.ones(())
            t_eeg = jnp.ones(())
            z_img = img_logits
            z_eeg = eeg_logits
        else:
            t_img = self.temp_img
            t_eeg = self.temp_eeg
            z_img = img_logits / t_img
            z_eeg = eeg_logits / t_eeg
        aux["temperatures"] = {"img": jax.lax.stop_gradient(t_img),
                               "eeg": jax.lax.stop_gradient(t_eeg)}

        h_img = _entropy(z_img, self.eps_log)
        h_eeg = _entropy(z_eeg, self.eps_log)
        aux["entropies"] = {"img": jax.lax.stop_gradient(h_img),
                            "eeg": jax.lax.stop_gradient(h_eeg)}

        if self.mode == "fixed_weights":
            alpha = jnp.full((b,), 0.5)
            aux["membership"] = None
            aux["firing_strengths"] = None
            aux["consequents"] = None
        elif self.mode == "no_fuzzification":
            conf_img = jnp.clip(1.0 - h_img / (self.max_entropy + self.eps_div), min=0.0)
            conf_eeg = jnp.clip(1.0 - h_eeg / (self.max_entropy + self.eps_div), min=0.0)
            alpha = jnp.clip(conf_img / (conf_img + conf_eeg + self.eps_div), 0.0, 1.0)
            aux["membership"] = None
            aux["firing_strengths"] = None
            aux["consequents"] = None
        else:
            mu_img_rel = self._gaussian_membership(h_img, 0.0, self.log_sigma_reliable_img)
            mu_img_unrel = self._gaussian_membership(
                h_img, self.c_unreliable_img, self.log_sigma_unreliable_img)
            mu_eeg_rel = self._gaussian_membership(h_eeg, 0.0, self.log_sigma_reliable_eeg)
            mu_eeg_unrel = self._gaussian_membership(
                h_eeg, self.c_unreliable_eeg, self.log_sigma_unreliable_eeg)
            aux["membership"] = jax.lax.stop_gradient({
                "img": {"rel": mu_img_rel, "unrel": mu_img_unrel},
                "eeg": {"rel": mu_eeg_rel, "unrel": mu_eeg_unrel},
            })
            # Product T-norm firing strengths.
            w = jnp.stack(
                [
                    mu_img_rel * mu_eeg_unrel,    # R1: Img Rel & EEG Unrel
                    mu_img_unrel * mu_eeg_rel,    # R2: Img Unrel & EEG Rel
                    mu_img_rel * mu_eeg_rel,      # R3: Both Rel
                    mu_img_unrel * mu_eeg_unrel,  # R4: Both Unrel
                ],
                axis=-1,
            )
            consequents = jax.nn.sigmoid(self.beta)
            aux["firing_strengths"] = jax.lax.stop_gradient(w)
            aux["consequents"] = jax.lax.stop_gradient(consequents)
            alpha = jnp.sum(w * consequents, axis=-1) / (jnp.sum(w, axis=-1) + self.eps_div)
            alpha = jnp.clip(alpha, 0.0, 1.0)

        aux["fuzz_params"] = jax.lax.stop_gradient({
            "c_unreliable": {"img": self.c_unreliable_img, "eeg": self.c_unreliable_eeg},
            "sigma_reliable": {
                "img": jnp.exp(self.log_sigma_reliable_img),
                "eeg": jnp.exp(self.log_sigma_reliable_eeg),
            },
            "sigma_unreliable": {
                "img": jnp.exp(self.log_sigma_unreliable_img),
                "eeg": jnp.exp(self.log_sigma_unreliable_eeg),
            },
        })

        fused = alpha[:, None] * z_img + (1.0 - alpha[:, None]) * z_eeg
        return fused, alpha, aux

    def temperature_regularization(self, t_min: float = 0.5, t_max: float = 5.0):
        """ReLU range penalty on both temperatures (fuzzy_gating_fusion.py:392-419)."""
        t_img = self.temp_img
        t_eeg = self.temp_eeg
        return (
            nn.relu(t_img - t_max) + nn.relu(t_min - t_img)
            + nn.relu(t_eeg - t_max) + nn.relu(t_min - t_eeg)
        )
