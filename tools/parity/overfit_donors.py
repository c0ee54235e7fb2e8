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


def overfit_vipt_head(donor, cfg, frames, gt, steps=1400, lr=2e-3, seed=0,
                      every=2, n_jitter=3, sigma=1.0, log_every=0):
    """Train donor.box_head (CenterPredictor) on FROZEN random backbone
    features so the ViPT response decisively peaks at the synthetic target
    (free-running ViPT A/B donor).

    With random weights the free-running box walks off target within ~2
    frames and the crop degenerates to padding, where the CE cut lands in
    exact attention-tie groups (check_trajectory_vipt.py docstring). Only
    the CENTER head is trained: the ViT backbone, prompt blocks, and
    candidate elimination keep their seeded random values, so the full
    attention/CE machinery under test runs exactly as in the forced check.
    Backbone features for the cached crop set are computed ONCE under
    no_grad, making the overfit cheap on one CPU core.

    Supervision mirrors cal_bbox's decode (ViPT/lib/models/layers/
    head.py:142-160): MSE of the sigmoid score_map against a Gaussian at
    the target's grid cell, L1 on size_map/offset_map at that cell. Crops
    use the reference's own cv2 sample_target at tracking geometry with
    pos/scale jitter (off-center crops occur when free-running). Runs in
    eval() mode throughout. Must be called inside reference_path("ViPT").
    """
    import torch

    from lib.test.tracker.data_utils import PreprocessorMM
    from lib.train.data.processing_utils import sample_target
    from lib.utils.ce_utils import generate_mask_cond

    donor.eval()
    rng = np.random.RandomState(seed)
    pre = PreprocessorMM()

    tf = cfg.TEST.TEMPLATE_FACTOR
    tsz = cfg.TEST.TEMPLATE_SIZE
    sf = cfg.TEST.SEARCH_FACTOR
    ssz = cfg.TEST.SEARCH_SIZE
    stride = cfg.MODEL.BACKBONE.STRIDE
    feat_sz = ssz // stride

    z_patch, _, _ = sample_target(frames[0], [float(v) for v in gt[0]],
                                  tf, output_sz=tsz)
    z = pre.process(z_patch)
    box_mask_z = None
    if cfg.MODEL.BACKBONE.CE_LOC:
        # CTR_POINT masks only the template's center token; the bbox
        # argument is unused on that path (ce_utils.py:22-35)
        box_mask_z = generate_mask_cond(cfg, 1, z.device,
                                        torch.zeros(1, 4))

    # collect crops + labels first (features are cached after BN
    # calibration below)
    crops = []
    k = np.arange(feat_sz, dtype=np.float64)
    for t in range(0, len(frames), every):
        x0, y0, w, h = [float(v) for v in gt[t]]
        cx, cy = x0 + 0.5 * w, y0 + 0.5 * h
        for j in range(n_jitter + 1):
            if j == 0:
                jb = [x0, y0, w, h]
            else:
                # position jitter wide (free-running crops go off-center);
                # scale jitter NARROW: the size labels must stay nearly
                # constant, because a constant-size bias feeds back
                # multiplicatively through the crop (w' ~ size_pred * 4 *
                # sqrt(wh)) and a few percent of over-prediction grows the
                # box exponentially until the target is lost
                dx, dy = rng.uniform(-0.25, 0.25, 2) * math.sqrt(w * h)
                # WIDE scale jitter: the size labels then vary with the
                # target's APPARENT size in the crop (w*rf/ssz spans
                # ~+-25%), which teaches the head to READ size instead of
                # predicting a constant — turning the crop-size feedback
                # loop from neutrally stable (any residual bias compounds
                # exponentially) into contractive (over-scaled crop ->
                # smaller apparent target -> smaller predicted size).
                # The residual MEAN bias is still cancelled exactly by
                # the logit-space calibration below.
                ds = math.exp(rng.uniform(-0.25, 0.25))
                jw, jh = w * ds, h * ds
                jb = [cx + dx - 0.5 * jw, cy + dy - 0.5 * jh, jw, jh]
            x_patch, rf, _ = sample_target(frames[t], jb, sf, output_sz=ssz)
            xs = pre.process(x_patch)
            # target center in crop coords: the crop is centered on jb
            jcx, jcy = jb[0] + 0.5 * jb[2], jb[1] + 0.5 * jb[3]
            ccx = (cx - jcx) * rf + 0.5 * ssz
            ccy = (cy - jcy) * rf + 0.5 * ssz
            gx, gy = ccx / stride, ccy / stride  # grid coords
            ix, iy = int(gx), int(gy)
            if not (0 <= ix < feat_sz and 0 <= iy < feat_sz):
                continue
            lab = np.exp(-0.5 * ((k[None, :] - gx) ** 2
                                 + (k[:, None] - gy) ** 2) / sigma ** 2)
            score_lab = torch.tensor(lab.astype(np.float32))[None, None]
            size_lab = torch.tensor([w * rf / ssz, h * rf / ssz],
                                    dtype=torch.float32)
            off_lab = torch.tensor([gx - ix, gy - iy], dtype=torch.float32)
            # size is supervised on the 3x3 neighborhood of the target
            # cell (the tracking-time argmax can land on an adjacent
            # cell; the target's size is the same there)
            nb = [(iy + dy) * feat_sz + (ix + dx)
                  for dy in (-1, 0, 1) for dx in (-1, 0, 1)
                  if 0 <= iy + dy < feat_sz and 0 <= ix + dx < feat_sz]
            crops.append((xs, score_lab, size_lab, off_lab,
                          iy * feat_sz + ix, torch.tensor(nb)))

    # BN CALIBRATION: the donor's running stats were set from uniform
    # junk inputs (the converter-parity exercise); real crop features
    # then land far outside those stats, saturating the head's sigmoid
    # branches (head.py:177 clamp) with exactly-zero gradients. A few
    # train()-mode forwards on REAL crops re-estimate the stats so the
    # eval-mode overfit (and tracking) sees live gradients.
    donor.train()
    with torch.no_grad():
        for xs, *_rest in crops[:8]:
            donor(z, xs, ce_template_mask=box_mask_z)
    donor.eval()

    # cache frozen backbone features once
    caches = []
    with torch.no_grad():
        for xs, score_lab, size_lab, off_lab, idx, nb in crops:
            feat, _aux = donor.backbone(z=z, x=xs,
                                        ce_template_mask=box_mask_z)
            caches.append((feat.detach(), score_lab, size_lab, off_lab,
                           idx, nb))

    # Train on PRE-sigmoid logits: get_score_map's clamp(sigmoid, 1e-4)
    # (head.py:177-179) has exactly-zero gradient once a cell saturates,
    # and MSE on the clamped output collapses the whole map into the dead
    # zone within a few Adam steps. BCE-with-logits on the conv5 outputs
    # keeps gradients alive; tracking then uses the clamped sigmoid of
    # the same trained logits.
    head = donor.box_head
    fln = donor.feat_len_s

    def branch(x, n):
        for i in range(1, 5):
            x = getattr(head, f"conv{i}_{n}")(x)
        return getattr(head, f"conv5_{n}")(x)

    def head_maps(feat):
        enc_opt = feat[:, -fln:]
        opt_f = enc_opt.unsqueeze(-1).permute((0, 3, 2, 1)).contiguous()
        opt_f = opt_f.view(-1, opt_f.shape[2], feat_sz, feat_sz)
        return (branch(opt_f, "ctr"), branch(opt_f, "size"),
                branch(opt_f, "offset"))

    opt = torch.optim.Adam(head.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=max(steps // 2, 1),
                                            gamma=0.25)
    bce = torch.nn.BCEWithLogitsLoss()
    loss = None
    for it in range(steps):
        feat, score_lab, size_lab, off_lab, idx, nb = caches[it % len(caches)]
        ctr_l, size_l, off_l = head_maps(feat)
        sc = bce(ctr_l, score_lab)
        # soft-target BCE: gradient (sigmoid(x) - target) stays alive even
        # when the branch starts saturated
        sz = torch.nn.functional.binary_cross_entropy_with_logits(
            size_l.flatten(2)[0, :, nb],
            size_lab[:, None].expand(-1, len(nb)))
        of = torch.abs(off_l.flatten(2)[0, :, idx] - off_lab).mean()
        loss = sc + 2.0 * sz + 0.2 * of
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        if log_every and it % log_every == 0:
            print(f"  vipt head overfit step {it}: loss {float(loss):.5f}"
                  f" (score {float(sc):.5f})")

    # SIZE-BIAS CALIBRATION: the crop-size feedback loop is neutrally
    # stable (next crop side = SEARCH_FACTOR * sqrt(w*h) of the predicted
    # box, so sqrt(cw*ch)*factor == 1 at the truth); a few percent of
    # systematic size over-prediction therefore grows the box
    # EXPONENTIALLY until the target is lost. Cancel the residual mean
    # bias exactly with a logit-space shift of the size branch's final
    # conv bias — a deterministic donor surgery shipped to both sides.
    with torch.no_grad():
        dsum, n = torch.zeros(2), 0
        for feat, _sl, size_lab, _ol, idx, _nb in caches:
            _c, size_l, _o = head_maps(feat)
            lab_logit = torch.log(size_lab / (1 - size_lab))
            dsum += lab_logit - size_l.flatten(2)[0, :, idx]
            n += 1
        delta = dsum / n
        head.conv5_size.bias += delta
        if log_every:
            print(f"  vipt size-bias calibration: logit delta "
                  f"{[round(float(v), 4) for v in delta]}")
    for p in donor.parameters():
        p.grad = None
    return float(loss)


def overfit_det_dimp_classifier(donor, frames, gt, steps=300, lr=1e-3,
                                seed=0, S=288, search_area_scale=5.0,
                                label_sigma=1.5, distractor_gt=None,
                                distractor_amp=0.65, log_every=0):
    """Train the DeT DiMPnet donor's classification feature extractors so
    the online-learned filter's response decisively peaks at the synthetic
    target (free-running DiMP A/B donor).

    DeT twin of overfit_super_dimp_classifier: the donor is
    dimpnet.dimp50_DeT (dual RGB/depth backbones + max merge,
    DeT/ltr/models/tracking/dimpnet.py:15-120), input is the raw 6-channel
    patch normalized per triplet exactly as the tracker's
    NetWithBackbone.preprocess_image does (net_wrappers.py:57-81). Only
    classifier.feature_extractor trains; both backbones, the filter
    initializer, the steepest-descent optimizer, and the IoUNet keep their
    seeded random values, so the online machinery under test runs exactly
    as in the per-transition check. The proxy regresses the
    filter-initializer filter's response from the frame-0 crop against a
    Gaussian at the target (differentiable; the SD init only sharpens it
    at tracking time). Runs in eval() mode throughout. Must be called
    inside ``reference_path("RGBD/models/DeT")``.
    """
    import torch

    from pytracking.features.preprocessing import numpy_to_torch, sample_patch

    donor.eval()
    rng = np.random.RandomState(seed)
    mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
    S_f = S // 16
    S_sc = S_f + 1  # even filter size 4 -> score support S_f + 1

    def normalize6(patch):
        color = (patch[:, :3] / 255.0 - mean) / std
        depth = (patch[:, 3:] / 255.0 - mean) / std
        return torch.cat((color, depth), 1)

    caches = []
    for t in range(len(frames)):
        im = numpy_to_torch(np.ascontiguousarray(frames[t]))
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
                bf = donor.extract_backbone_features(normalize6(patch))
                l3 = donor.get_backbone_clf_feat(bf)
            bb = torch.tensor([[(x - c[1]) / scale, (y - c[0]) / scale,
                                w / scale, h / scale]], dtype=torch.float32)
            k = np.arange(S_sc, dtype=np.float64) - (S_f - 1) / 2

            def gauss(cyx, amp):
                norm = (np.asarray(cyx) - sample_pos) / (scale * S)
                center = S_f * norm + 0.5
                gy = np.exp(-0.5 * (k - center[0]) ** 2 / label_sigma ** 2)
                gx = np.exp(-0.5 * (k - center[1]) ** 2 / label_sigma ** 2)
                return amp * gy[:, None] * gx[None, :]

            lab = gauss([cy, cx], 1.0)
            # supervise the distractor as a DECISIVE secondary peak: at
            # amp 0.65 the reference's own localize_advanced ratio sits
            # firmly between the 0.5 hard-negative and 0.8 distractor
            # thresholds — without this, the pasted 0.8-dimmed copy's
            # learned response lands ON the 0.5x boundary and free-running
            # flags flip on sub-1e-3 noise
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
            print(f"  det_dimp overfit step {it}: mse {float(loss):.5f}")
    for p in donor.parameters():
        p.grad = None
    return float(loss)


def overfit_mixformer_head(donor, cfg, frames, gt, steps=400, lr=2e-3,
                           seed=0, every=2, n_jitter=2, log_every=0):
    """Train donor.box_head (corner soft-argmax) so MixFormer's predicted
    boxes track the synthetic target (free-running A/B donor + the
    'complex' re-constraint ACCEPT path).

    With a random corner head the predicted size vs the his_w/his_h
    history violates the 1.35x scale gate every frame, so the 'complex'
    re-constraint accept branch (tracker_utils.py:146-166) never runs.
    Training ONLY the head — the dual-CVT backbone, mixed attention, and
    score branch (bias-shifted separately) keep their seeded values — at
    tracking geometry makes predictions consistent: the scale/displacement
    gates then pass on confident frames and tracking is stable enough to
    free-run. Backbone features are cached under no_grad (joint
    template/online/search forward, mixformerrgbd_online.py:720-731).
    Losses are plain L1 on the soft-argmax cxcywh (no sigmoid dead zone).
    Scale jitter is kept narrow for the same size-feedback reason as
    overfit_vipt_head. Must be called inside
    ``reference_path("RGBD/models/MixFormer_RGBD")``.
    """
    import torch

    from lib.test.tracker.tracker_utils import Preprocessor_wo_mask_rgbd
    from lib.train.data.processing_utils import sample_target

    donor.eval()
    rng = np.random.RandomState(seed)
    pre = Preprocessor_wo_mask_rgbd()

    tf = cfg.TEST.TEMPLATE_FACTOR
    tsz = cfg.TEST.TEMPLATE_SIZE
    sf = cfg.TEST.SEARCH_FACTOR
    ssz = cfg.TEST.SEARCH_SIZE

    z_patch, _, _ = sample_target(frames[0], [float(v) for v in gt[0]],
                                  tf, output_sz=tsz)
    z = pre.process(z_patch)

    caches = []
    for t in range(0, len(frames), every):
        x0, y0, w, h = [float(v) for v in gt[t]]
        cx, cy = x0 + 0.5 * w, y0 + 0.5 * h
        for j in range(n_jitter + 1):
            if j == 0:
                jb = [x0, y0, w, h]
            else:
                dx, dy = rng.uniform(-0.25, 0.25, 2) * math.sqrt(w * h)
                ds = math.exp(rng.uniform(-0.05, 0.05))
                jw, jh = w * ds, h * ds
                jb = [cx + dx - 0.5 * jw, cy + dy - 0.5 * jh, jw, jh]
            x_patch, rf, _ = sample_target(frames[t], jb, sf, output_sz=ssz)
            xs = pre.process(x_patch)
            with torch.no_grad():
                # RGBD 6-ch split: dual CVTs + merge, exactly as the
                # model's own forward (mixformerrgbd_online.py:851-857)
                _t_rgb, s_rgb = donor.backbone(z[:, :3], z[:, :3],
                                               xs[:, :3])
                _t_dp, s_dp = donor.backbone_depth(z[:, 3:], z[:, 3:],
                                                   xs[:, 3:])
                s_feat = donor.merge(s_rgb, s_dp)
            jcx, jcy = jb[0] + 0.5 * jb[2], jb[1] + 0.5 * jb[3]
            ccx = (cx - jcx) * rf + 0.5 * ssz
            ccy = (cy - jcy) * rf + 0.5 * ssz
            lab = torch.tensor([ccx / ssz, ccy / ssz,
                                w * rf / ssz, h * rf / ssz],
                               dtype=torch.float32)
            caches.append((s_feat.detach(), lab))

    opt = torch.optim.Adam(donor.box_head.parameters(), lr=lr)
    loss = None
    for it in range(steps):
        s_feat, lab = caches[it % len(caches)]
        _out, coord = donor.forward_box_head(s_feat)
        loss = torch.abs(coord.view(4) - lab).mean()
        opt.zero_grad()
        loss.backward()
        opt.step()
        if log_every and it % log_every == 0:
            print(f"  mixformer head overfit step {it}: l1 {float(loss):.5f}")
    for p in donor.parameters():
        p.grad = None
    return float(loss)
