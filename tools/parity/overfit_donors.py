"""Overfit the reference torch LWL/STM donors so their masks are non-empty.

With freshly-seeded random weights (no checkpoint exists in this
environment, and none can be fetched), both the fork's LWL and STM nets
segment nothing on the synthetic sequence: every sigmoid sits near 0.5,
the min_mask_area gate fails every frame, and both trackers fall back to
constant boxes — so the trajectory A/Bs' box rows compare constants
(docs/PARITY.md round-3 caveat).

This module closes that gap by briefly overfitting ONLY the decoder of
each donor on tracking-geometry crops of the synthetic sequence:

  - the backbone / encoders / label encoder / few-shot GN learner /
    key-value projections keep their seeded random values, so the online
    machinery under test (LWL's Gauss-Newton filter solves over the mask
    memory, lwl.py:523-585; STM's space-time memory reads, stm/model.py
    :221-247) runs exactly as in the random-weight checks;
  - the decoder learns to turn that machinery's outputs into real masks,
    which makes the seg->box estimation ('var' center-of-mass,
    lwl.py:~430-470; 'md_hack', stm.py), the min_mask_area gate, and the
    mask-driven memory updates non-vacuous in the A/B.

Training runs in eval() mode throughout (BatchNorm uses its initial
running stats), so the overfit decoder behaves identically at tracking
time. All torch; must be called inside the check scripts'
``reference_path("RGBD/models/keep_track_vot2021")`` context because it
imports the fork's own ``sample_patch`` for crop geometry
(pytracking/features/preprocessing.py:55).
"""

from __future__ import annotations

import math

import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _crop_pairs(frames, gt, S, search_area_scale, rng, n_jitter=1):
    """(raw_patch (1,3,S,S) in [0,255], mask (1,1,S,S)) pairs at tracker
    crop geometry: crop side = search_area_scale * sqrt(w*h) around the
    target center (stm.py:69-70), plus small pos/scale jitter so the
    decoder tolerates the off-center crops tracking produces."""
    import torch

    from pytracking.features.preprocessing import numpy_to_torch, sample_patch

    pairs = []
    H, W = frames.shape[1:3]
    for t in range(len(frames)):
        im = numpy_to_torch(frames[t])  # (1,3,H,W) float, 0..255
        x, y, w, h = [float(v) for v in gt[t]]
        mask_im = torch.zeros(1, 1, H, W)
        mask_im[:, :, int(y):int(y + h), int(x):int(x + w)] = 1.0
        base_pos = torch.tensor([y + (h - 1) / 2, x + (w - 1) / 2])
        base_side = search_area_scale * math.sqrt(w * h)
        for j in range(n_jitter + 1):
            if j == 0:
                pos, side = base_pos, base_side
            else:
                pos = base_pos + torch.tensor(
                    rng.uniform(-0.15, 0.15, 2) * math.sqrt(w * h)).float()
                side = base_side * math.exp(rng.uniform(-0.15, 0.15))
            sz = torch.tensor([side, side])
            out_sz = torch.tensor([S, S])
            patch, _ = sample_patch(im, pos, sz, out_sz)
            mpatch, _ = sample_patch(mask_im, pos, sz, out_sz, is_mask=True)
            pairs.append((patch.detach(), mpatch.detach()))
    return pairs


def _bce(logits, target):
    import torch.nn.functional as F

    return F.binary_cross_entropy_with_logits(logits, target)


def overfit_lwl_decoder(donor, frames, gt, steps=250, lr=1e-3, seed=0,
                        S=480, search_area_scale=6.0, net_opt_iter=20,
                        log_every=0):
    """Train donor.decoder so LWL segments the synthetic target.

    Mirrors the tracker's own inference path per crop: normalized image ->
    backbone -> target-model features -> mask encoding via the GN filter
    learned from the frame-0 crop (init_target_model, lwl.py:523-545) ->
    decoder -> BCE against the crop-space rectangle mask. Only
    donor.decoder parameters receive gradients. Returns the final loss.
    """
    import torch

    donor.eval()
    rng = np.random.RandomState(seed)
    pairs = _crop_pairs(frames, gt, S, search_area_scale, rng)

    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)

    def backbone(patch):
        return donor.extract_backbone_features((patch / 255.0 - mean) / std)

    # frame-0 filter exactly as the tracker's init (num_iter=net_opt_iter)
    with torch.no_grad():
        bf0 = backbone(pairs[0][0])
        x0 = donor.extract_target_model_features(bf0)
        label0, sw0 = donor.label_encoder(pairs[0][1][:, 0][None],
                                          x0.unsqueeze(1))
        target_filter, _, _ = donor.target_model.get_filter(
            x0.unsqueeze(1), label0, sw0, num_iter=net_opt_iter)

        # precompute per-crop decoder inputs (everything upstream frozen)
        feats = []
        for patch, mpatch in pairs:
            bf = backbone(patch)
            tm = donor.extract_target_model_features(bf)
            enc = donor.target_model.apply_target_model(
                target_filter, tm.view(1, 1, *tm.shape[-3:]))
            feats.append((enc, bf, mpatch))

    opt = torch.optim.Adam(donor.decoder.parameters(), lr=lr)
    loss = None
    for it in range(steps):
        enc, bf, mpatch = feats[it % len(feats)]
        pred, _ = donor.decoder(enc, bf, (S, S))
        loss = _bce(pred.view(1, 1, S, S), mpatch)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if log_every and it % log_every == 0:
            print(f"  lwl overfit step {it}: bce {float(loss):.4f}")
    for p in donor.parameters():
        p.grad = None
    return float(loss)


def overfit_stm_decoder(net, frames, gt, steps=250, lr=1e-3, seed=0,
                        S=384, search_area_scale=5.0, log_every=0):
    """Train net.Decoder so STM segments the synthetic target.

    Memorizes the frame-0 crop + rectangle mask with the frozen encoders
    (model.py:187-210), then per training crop precomputes the frozen
    memory read (Memory over the init key/value, model.py:221-236) and
    query skips, and optimizes only the Decoder with BCE against the
    crop-space mask. Returns the final loss.
    """
    import torch

    net.eval()
    rng = np.random.RandomState(seed)
    pairs = _crop_pairs(frames, gt, S, search_area_scale, rng)

    with torch.no_grad():
        frame0 = pairs[0][0] / 255.0
        m0 = pairs[0][1][0, 0]
        masks0 = torch.stack([1.0 - m0, m0])[None]  # (1, 2, S, S)
        n1 = torch.LongTensor([1])
        k0, v0 = net(frame0, masks0, n1)  # memorize

        feats = []
        for patch, mpatch in pairs:
            r4, r3, r2, _, _ = net.Encoder_Q(patch / 255.0)
            k4, v4 = net.KV_Q_r4(r4)
            m4, _ = net.Memory(k0[0, 1:2], v0[0, 1:2], k4, v4)
            feats.append((m4, r3, r2, mpatch))

    opt = torch.optim.Adam(net.Decoder.parameters(), lr=lr)
    loss = None
    for it in range(steps):
        m4, r3, r2, mpatch = feats[it % len(feats)]
        logits = net.Decoder(m4, r3, r2)  # (1, 2, S, S)
        loss = _bce(logits[:, 1:2], mpatch)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if log_every and it % log_every == 0:
            print(f"  stm overfit step {it}: bce {float(loss):.4f}")
    for p in net.parameters():
        p.grad = None
    return float(loss)


def overfit_super_dimp_classifier(donor, frames, gt, steps=300, lr=1e-3,
                                  seed=0, S=480, search_area_scale=8.0,
                                  label_sigma=2.0, target_amp=1.0,
                                  distractor_gt=None, distractor_amp=0.45,
                                  log_every=0):
    """Train donor.classifier.feature_extractor so the DiMP response peaks
    at the synthetic target (super_dimp_hinge donor for the KeepTrack
    trajectory A/B).

    With a freshly-seeded donor the classifier response never clears the
    0.05 peak-extraction gate (keep_track.py:950), so the KeepTrack A/B
    degenerates to the advanced-localization fallback on every frame.
    This overfits ONLY the classification feature extractor (the residual
    bottleneck block after layer3): backbone, filter initializer, hinge GN
    optimizer, IoUNet and the peak-matching net keep their seeded values,
    so the online machinery under test runs exactly as in the random-
    weight checks. The training proxy regresses the response of the
    FILTER-INITIALIZER filter (differentiable, no GN unroll) from the
    frame-0 crop against a Gaussian at the target; at tracking time the
    hinge-GN init only sharpens it. When the synthetic sequence carries
    the identical-appearance distractor (make_synthetic_sequence
    distractor=True), translation equivariance makes the distractor light
    up as a secondary peak without any distractor supervision — exactly
    the multi-peak regime KeepTrack's matcher exists for.

    Runs in eval() mode throughout. Must be called inside
    ``reference_path("RGBD/models/keep_track_vot2021")``.
    """
    import torch

    from pytracking.features.preprocessing import numpy_to_torch, sample_patch

    donor.eval()
    rng = np.random.RandomState(seed)
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    S_f, S_sc = S // 16, S // 16 + 1   # stride-16 grid, even-4-kernel pad

    caches = []
    for t in range(len(frames)):
        im = numpy_to_torch(np.ascontiguousarray(frames[t][..., :3]))
        x, y, w, h = [float(v) for v in gt[t]]
        cy, cx = y + (h - 1) / 2, x + (w - 1) / 2
        base_side = search_area_scale * math.sqrt(w * h)
        for j in range(2):
            if j == 0:
                pos, side = torch.tensor([cy, cx]), base_side
            else:
                pos = torch.tensor([cy, cx]) + torch.tensor(
                    rng.uniform(-0.2, 0.2, 2) * math.sqrt(w * h)).float()
                side = base_side * math.exp(rng.uniform(-0.2, 0.2))
            patch, coords = sample_patch(im, pos,
                                         torch.tensor([side, side]),
                                         torch.tensor([S, S]))
            c = coords[0].numpy().astype(np.float64)
            sample_pos = 0.5 * (c[:2] + c[2:] - 1)
            scale = (c[2] - c[0]) / S
            with torch.no_grad():
                bf = donor.extract_backbone_features(
                    (patch / 255.0 - mean) / std)
                l3 = donor.get_backbone_clf_feat(bf)
            bb = torch.tensor([[(x - c[1]) / scale, (y - c[0]) / scale,
                                w / scale, h / scale]], dtype=torch.float32)
            # Gaussian label(s) on the end-padded score grid, centered with
            # the tracker's own mapping (get_label_function); the
            # distractor — identical appearance by construction — gets an
            # explicit secondary peak so the multi-peak regime trains in
            k = np.arange(S_sc, dtype=np.float64) - (S_f - 1) / 2

            def gauss(cyx, amp):
                norm = (np.asarray(cyx) - sample_pos) / (scale * S)
                center = S_f * norm + 0.5
                gy = np.exp(-0.5 * (k - center[0]) ** 2 / label_sigma ** 2)
                gx = np.exp(-0.5 * (k - center[1]) ** 2 / label_sigma ** 2)
                return amp * gy[:, None] * gx[None, :]

            lab = gauss([cy, cx], target_amp)
            if distractor_gt is not None \
                    and not np.any(np.isnan(distractor_gt[t])):
                ddx, ddy, dw, dh = [float(v) for v in distractor_gt[t]]
                lab = np.maximum(lab, gauss([ddy + (dh - 1) / 2,
                                             ddx + (dw - 1) / 2],
                                            distractor_amp))
            label = torch.tensor(lab.astype(np.float32))[None, None]
            caches.append((l3.detach(), bb, label))

    fe = donor.classifier.feature_extractor
    opt = torch.optim.Adam(fe.parameters(), lr=lr)
    l3_0, bb_0, _ = caches[0]
    loss = None
    for it in range(steps):
        l3, bb, label = caches[it % len(caches)]
        f0 = donor.classifier.extract_classification_feat(l3_0)
        w0 = donor.classifier.filter_initializer(f0, bb_0)
        ft = donor.classifier.extract_classification_feat(l3)
        scores = donor.classifier.classify(w0, ft)
        loss = torch.mean((scores.view(1, 1, S_sc, S_sc) - label) ** 2)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if log_every and it % log_every == 0:
            print(f"  super_dimp overfit step {it}: mse {float(loss):.5f}")
    for p in donor.parameters():
        p.grad = None
    return float(loss)
