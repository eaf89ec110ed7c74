"""One-command acceptance runbook for the real NL-VSGG artifacts.

The R@K acceptance gate (BASELINE.json: R@20/50 within 0.5 points of the
PyTorch baseline) needs three artifacts this environment does not ship:
`vinvl_vg_x152c4.pth` (ref lib/assign_pseudo_label.py:973-1000), `LLM_cp.pt`
(ref NL-VSGG/ADV.py:48-52), and a trained relation checkpoint (the torch
.tar the reference's tools/test_STTran.py:51-52 loads). The day they exist,
this script is the whole gate:

  python tools/acceptance.py --cfg configs/nl_vsgg_config.yml \
      --vinvl vinvl_vg_x152c4.pth --clip LLM_cp.pt \
      --relation_ckpt model_best.tar --out_dir /tmp/acceptance \
      [--expected_json expected.json] [--oracle_videos 50] [--max_videos 0]

Stages (each prints its own verdict; the final table summarizes):
  1. convert   — VinVL .pth -> framework .npz (tools/convert_vinvl flow) and
                 relation .tar -> Orbax (tools/convert_relation_ckpt, family
                 auto-detected).
  2. validate  — per-stage activation diffs of the conversions
                 (tools/validate_ckpt: stem/C2/C3/C4/RPN/C5/predictor for
                 VinVL, vision+text towers for CLIP).
  3. oracle    — ground `--oracle_videos` test videos through the actual
                 eval data path (wk_forward, is_train=False with GT
                 relations attached) and score the oracle predictions
                 (data/grounding.entry_to_pred, ref assign_pseudo_label.py:
                 1391-1415): the grounding-quality CEILING any model can
                 reach on this data. Near-zero here means the data engine,
                 not the model, is broken.
  3c. train_e2e (--train_e2e N) — the sustained system number on the real
                 artifacts: N epochs of the composed ground -> prefetch ->
                 place -> step loop (bench_suite.run_train_e2e_loop; epoch 0
                 cold builds the entry cache + device store, warm epochs
                 measure the device-resident tier) — parity AND throughput
                 from one command.
  4. eval      — the full tools/test_STTran.py / test_DSG_DETR.py evaluation
                 (streamed, batched, live union features when --vinvl is
                 given) printing R@10/20/50 + mR@K in the reference's
                 print_stats format (ref tools/test_STTran.py:75-92).
  4b. ref_baseline (--ref_baseline) — self-baselining: run the LIVE torch
                 reference eval (/root/reference, test_STTran.py:75-92
                 protocol) on the same videos and write expected.json —
                 the parity gate then needs no hand-authored numbers.
  5. parity    — ours vs --expected_json (or the stage-4b expected.json):
                 ({"recall": {"20": .., "50": ..}, "mean_recall": {...}},
                 fractions in [0, 1]); gate is |ours - expected| <= 0.005
                 (0.5 points). Without either, the table prints ours alone
                 (the reference repo publishes no numbers, BASELINE.md).

Exit code 0 iff every executed stage passed. tests/test_acceptance.py runs
this end to end on synthetic file-backed artifacts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GATE_PTS = 0.5  # R@K acceptance tolerance, in percentage points


def _stage(results, name, ok, detail=""):
    results.append((name, bool(ok), detail))
    print(f"[acceptance] {name:<18} {'PASS' if ok else 'FAIL'}  {detail}")
    return bool(ok)


def convert_vinvl(vinvl_path, out_dir):
    """.pth -> .npz via the production converter (detector/convert.py)."""
    from nl_vsgg_tpu.detector.convert import load_checkpoint, save_npz

    dst = os.path.join(out_dir, "vinvl_converted.npz")
    n_arrays = save_npz(load_checkpoint(vinvl_path), dst)
    return dst, n_arrays


def _load_tool(name):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(os.path.dirname(os.path.abspath(__file__)), f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def run_oracle(cfg, n_videos):
    """Grounding-ceiling R@K over the first n groundable test videos."""
    from nl_vsgg_tpu.data import schema
    from nl_vsgg_tpu.data.action_genome import AGTest
    from nl_vsgg_tpu.data.grounding import entry_to_pred
    from nl_vsgg_tpu.eval import SceneGraphEvaluator

    train_mod = _load_tool("train_STTran")
    tax = schema.load_taxonomy()
    ds = AGTest(cfg.data_path if cfg.data_path.endswith("annotations")
                else os.path.join(cfg.data_path, "annotations"))
    ev = SceneGraphEvaluator(mode="sgdet", taxonomy=tax)
    n = min(n_videos, len(ds)) if n_videos else len(ds)
    for i in range(n):
        # the eval data path, but with GT relation labels attached so the
        # oracle has relations to emit (attach_gt: train-style GT fields on
        # the test-split grounding)
        e = train_mod.ground_video(ds, i, cfg, True, cfg.buckets)
        ev.evaluate_scene_graph(ds.gt_annotations[i], entry_to_pred(e))
    ev.calculate_mean_recall()
    return ev, n


def run_ref_baseline(cfg, args, out_dir, family):
    """Self-baselining parity stage (VERDICT r3 #4): run the LIVE torch
    reference eval — the exact per-video protocol of
    /root/reference/tools/test_STTran.py:75-92 (detector entry -> model ->
    evaluate_scene_graph; DSG-DETR additionally runs lib/track.py
    get_sequence, tools/test_DSG_DETR.py:84) — on the same test videos and
    return the numbers for expected.json, so the 0.5-pt gate needs no
    hand-authored baseline. Needs the reference repo at /root/reference, a
    torch .tar relation checkpoint, and the cached VinVL frame features the
    reference's load_feature reads (lib/assign_pseudo_label.py:27-45).

    The reference hardcodes CWD-relative datasets/ paths; a scratch CWD of
    symlinks is built under out_dir (read-only w.r.t. the data dir). The
    class-name txts the reference reads from its data root are supplied
    from assets/ when the root does not ship them. GloVe embeddings are
    stub-initialized (tests/ref_stubs.py) — harmless for eval because the
    checkpoint's own obj_embed weights overwrite them via load_state_dict.

    Returns (expected dict, n_videos)."""
    import importlib
    from types import SimpleNamespace

    from tests.ref_stubs import install  # the single consistent stub set
    install()
    import torch

    import lib.assign_pseudo_label as apl
    real_device = torch.device
    apl.torch.device = lambda spec: real_device("cpu")

    ann = (cfg.data_path if cfg.data_path.endswith("annotations")
           else os.path.join(cfg.data_path, "annotations"))
    assets = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "assets")

    scratch = os.path.join(out_dir, "ref_cwd")
    agd = os.path.join(scratch, "datasets", "AG")
    os.makedirs(agd, exist_ok=True)

    def _link(src, dst):
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(os.path.abspath(src), dst)

    for name in ("ag_to_oi_word_map_synset.npy", "oi_to_ag_word_map_synset.npy"):
        _link(os.path.join(assets, name),
              os.path.join(scratch, "datasets", name))
    _link(cfg.frame_features_path, os.path.join(agd, "frame_features"))
    for cand in (os.path.join(ann, os.pardir, "ag_img_info_test.pkl"),
                 os.path.join(ann, "ag_img_info_test.pkl")):
        if os.path.isfile(cand):
            _link(cand, os.path.join(agd, "ag_img_info_test.pkl"))
            break
    sann = os.path.join(scratch, "annotations")
    os.makedirs(sann, exist_ok=True)
    for entry in os.listdir(ann):
        _link(os.path.join(ann, entry), os.path.join(sann, entry))
    for t in ("object_classes.txt", "relationship_classes.txt"):
        if not os.path.exists(os.path.join(sann, t)):
            _link(os.path.join(assets, t), os.path.join(sann, t))

    cwd = os.getcwd()
    os.chdir(scratch)
    try:
        from dataloader.wk_action_genome import AG_Test
        from lib.evaluation_recall import SceneGraphEvaluator as RefEval
        from lib.object_detector import detector as RefDetector

        class _Log:
            def info(self, *a, **k):
                pass

        ds = AG_Test("test", _Log(), data_path=os.path.abspath(sann))
        # AG_Test defines no object_classes4gt — the reference's own
        # tools/test_STTran.py:42 crashes on it as shipped (the attribute
        # exists only on the TRAIN dataset, dataloader/wk_action_genome.py:
        # 31-42). Rebuild the train-side list: raw txt names with the five
        # singleton renames (the 5 indices AG_Test mutates to slashed names
        # are exactly the 5 the 4gt list renames, so this reconstruction is
        # exact).
        classes4gt = list(ds.object_classes)
        for i, name in ((9, "cabinet"), (11, "glass"), (23, "paper"),
                        (24, "phone"), (31, "sofa")):
            classes4gt[i] = name
        RefModel = importlib.import_module(
            "lib.dsg_detr" if family == "dsg_detr" else "lib.sttran").STTran
        model = RefModel(
            mode=cfg.mode,
            attention_class_num=len(ds.attention_relationships),
            spatial_class_num=len(ds.spatial_relationships),
            contact_class_num=len(ds.contacting_relationships),
            obj_classes=classes4gt,
            enc_layer_num=cfg.enc_layer, dec_layer_num=cfg.dec_layer,
            transformer_mode=cfg.transformer_mode, is_wks=cfg.is_wks,
            feat_dim=cfg.feat_dim).eval()
        ckpt = torch.load(args.relation_ckpt, map_location="cpu",
                          weights_only=False)
        model.load_state_dict(ckpt.get("state_dict", ckpt), strict=False)
        ref_ev = RefEval(
            mode=cfg.mode, AG_object_classes=ds.object_classes,
            AG_all_predicates=ds.relationship_classes,
            AG_attention_predicates=ds.attention_relationships,
            AG_spatial_predicates=ds.spatial_relationships,
            AG_contacting_predicates=ds.contacting_relationships,
            iou_threshold=0.5, constraint="with")
        ref_ev.register_container()
        # union_box_feature is forced OFF on the reference side: its
        # union extraction needs the external maskrcnn/scene-graph-benchmark
        # packages (lib/assign_pseudo_label.py:20-23), absent here and
        # stubbed by ref_stubs. Without --vinvl our eval runs the same
        # zero-union configuration, so the comparison stays paired; with
        # --vinvl the table is ours-with-unions vs ref-without — warned.
        if cfg.union_box_feature:
            print("[acceptance] ref_baseline: reference runs with "
                  "union_box_feature=false (maskrcnn stack unavailable); "
                  "pair it with a zero-union eval for an exact gate")
        conf_ns = SimpleNamespace(is_wks=cfg.is_wks, mode=cfg.mode,
                                  pseudo_way=cfg.pseudo_way,
                                  union_box_feature=False)
        det = RefDetector(train=True, object_classes=classes4gt,
                          use_SUPPLY=True, conf=conf_ns).eval()
        det.is_train = False
        if family == "dsg_detr":
            from lib.matcher import HungarianMatcher
            from lib.track import get_sequence
            matcher = HungarianMatcher(0.5, 1, 1, 0.5)
        n = len(ds) if not args.max_videos else min(args.max_videos, len(ds))
        with torch.no_grad():
            for i in range(n):
                gt = ds.gt_annotations[i]
                entry = det(gt, ds.video_list[i], None, None)
                if family == "dsg_detr" and entry is not None:
                    im_info = torch.as_tensor(
                        np.asarray(ds.img_info[i], dtype=np.float32))
                    get_sequence(entry, gt, matcher,
                                 im_info[0][:2] / im_info[0, 2], cfg.mode)
                pred = model(entry) if entry is not None else {}
                ref_ev.evaluate_scene_graph(gt, pred)
        ref_ev.calculate_mean_recall()
    finally:
        os.chdir(cwd)
    rd, m = ref_ev.result_dict, cfg.mode

    def _means(key):
        return {str(k): float(np.mean(v)) if len(v) else 0.0
                for k, v in rd[f"{m}_{key}"].items()}

    expected = {"recall": _means("recall"),
                "recall_nogc": _means("recall_nogc"),
                "mean_recall": {str(k): float(v)
                                for k, v in rd[f"{m}_mean_recall"].items()}}
    return expected, n


def parity_table(evaluator, expected, log=print):
    """Print ours vs expected; True iff every expected entry is within gate."""
    ok = True
    rows = []
    ours = {
        "recall": {k: float(np.mean(v)) if v else 0.0
                   for k, v in evaluator.recall.items()},
        "recall_nogc": {k: float(np.mean(v)) if v else 0.0
                        for k, v in evaluator.recall_nogc.items()},
        "mean_recall": {k: float(v)
                        for k, v in evaluator.mean_recall.mean_recall.items()},
    }
    for group, vals in ours.items():
        for k, v in sorted(vals.items(), key=lambda kv: int(kv[0])):
            exp = (expected or {}).get(group, {}).get(str(k))
            if exp is None:
                rows.append((f"{group}@{k}", v, None, None, ""))
                continue
            delta_pts = abs(v - float(exp)) * 100.0
            within = delta_pts <= GATE_PTS
            ok &= within
            rows.append((f"{group}@{k}", v, float(exp), delta_pts,
                         "ok" if within else "FAIL"))
    log(f"{'metric':<16} {'ours':>8} {'expected':>9} {'|Δ| pts':>8}  gate")
    for name, v, exp, dpts, verdict in rows:
        exp_s = f"{exp:9.4f}" if exp is not None else "        —"
        d_s = f"{dpts:8.3f}" if dpts is not None else "       —"
        log(f"{name:<16} {v:8.4f} {exp_s} {d_s}  {verdict}")
    return ok


def main(argv=None):
    p = argparse.ArgumentParser(description="NL-VSGG acceptance runbook")
    p.add_argument("--cfg", dest="cfg_file", required=True)
    p.add_argument("--vinvl", default=None, help="vinvl_vg_x152c4.pth")
    p.add_argument("--clip", default=None, help="DAC LLM_cp.pt")
    p.add_argument("--relation_ckpt", default=None,
                   help="trained relation checkpoint: reference torch .tar "
                        "(converted in-place) or an existing Orbax dir")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--oracle_videos", type=int, default=50)
    p.add_argument("--oracle_min", type=float, default=0.3,
                   help="minimum grounding-ceiling R@20: a mostly-broken "
                        "grounding engine yields a tiny nonzero ceiling, "
                        "which must fail HERE, not at the parity gate")
    p.add_argument("--family", choices=["auto", "sttran", "dsg_detr"],
                   default="auto",
                   help="relation-model family; 'auto' detects from a .tar "
                        "checkpoint or from the family.json sidecar written "
                        "next to a converted Orbax dir")
    p.add_argument("--max_videos", type=int, default=0,
                   help="cap eval videos (0 = full split)")
    p.add_argument("--train_e2e", type=int, default=0, metavar="EPOCHS",
                   help="also run the train_e2e system-timing stage for this "
                        "many epochs on the real train split (epoch 0 cold, "
                        "rest warm; bench_suite.run_train_e2e_loop)")
    p.add_argument("--expected_json", default=None,
                   help="JSON with the PyTorch baseline numbers (fractions): "
                        '{"recall": {"20": 0.26, "50": 0.33}, ...}')
    p.add_argument("--ref_baseline", action="store_true",
                   help="self-baseline: run the LIVE torch reference eval "
                        "(/root/reference) on the same videos and write "
                        "expected.json for the parity gate — no hand-"
                        "authored numbers needed. Requires --relation_ckpt "
                        "as a torch .tar; --expected_json takes precedence")
    p.add_argument("--atol", type=float, default=1e-3,
                   help="validate_ckpt per-stage relative threshold")
    args = p.parse_args(argv)

    from nl_vsgg_tpu.utils.config import load_config

    os.makedirs(args.out_dir, exist_ok=True)
    results: list[tuple[str, bool, str]] = []
    overrides = {}

    # ---- stage 1+2: VinVL convert + validate ----
    if args.vinvl:
        import torch
        vc = _load_tool("validate_ckpt")
        ckpt = torch.load(args.vinvl, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
        diffs = vc.validate_vinvl(sd, atol=args.atol,
                                  log=lambda s: print("  " + s.strip()))
        _stage(results, "validate_vinvl", diffs.pop("_ok") == 1.0,
               f"worst stage |Δ| {max(diffs.values()):.2e}")
        npz, n_arrays = convert_vinvl(args.vinvl, args.out_dir)
        _stage(results, "convert_vinvl", True, f"{n_arrays} arrays -> {npz}")
        overrides["vinvl_ckpt"] = npz
        overrides["ckpt"] = npz
    if args.clip:
        vc = _load_tool("validate_ckpt")
        cdiffs = vc.validate_clip(args.clip, log=lambda s: print("  " + s.strip()))
        _stage(results, "validate_clip", cdiffs.pop("_ok") == 1.0,
               f"worst tower |Δ| {max(cdiffs.values()):.2e}")

    cfg = load_config(args.cfg_file, overrides)

    # ---- stage 3: grounding-ceiling oracle R@K ----
    if args.oracle_videos:
        ev, n = run_oracle(cfg, args.oracle_videos)
        r20, r50 = ev.mean_score(20), ev.mean_score(50)
        # the ceiling must clear the gate with margin — a broken grounding
        # engine caps every model below the baseline before eval even runs
        _stage(results, "oracle_grounding", r20 >= args.oracle_min,
               f"{n} videos  ceiling R@20 {r20:.4f}  R@50 {r50:.4f}  "
               f"(gate >= {args.oracle_min})")

    # ---- stage 3c: train_e2e system timing on the real artifacts ----
    # (VERDICT r4 #7: one command produces parity AND the system number —
    # the composed ground -> prefetch -> place -> step loop of
    # bench_suite.run_train_e2e_loop, pointed at the real dataset; cold
    # epoch builds the caches, warm epochs measure the sustained tier)
    if args.train_e2e:
        try:
            from nl_vsgg_tpu.data.action_genome import AGTrain
            from nl_vsgg_tpu.data.pipeline import TruncationCounter
            bs_mod = _load_tool("bench_suite")
            train_mod = _load_tool("train_STTran")
            ds = AGTrain(cfg.data_path,
                         pseudo_label_path=cfg.pseudo_localized_SG_path,
                         remove_one_frame_video=cfg.remove_one_frame_video)
            trunc = TruncationCounter()

            def _ground(i):
                return train_mod.ground_video(ds, int(i), cfg, True,
                                              cfg.buckets,
                                              on_truncate=trunc.add)

            n_vid = min(args.max_videos, len(ds)) if args.max_videos \
                else len(ds)
            n_vid -= n_vid % cfg.batch_videos  # no mid-epoch tail compile
            res = bs_mod.run_train_e2e_loop(
                cfg, ds, _ground, n_videos=n_vid, epochs=args.train_e2e,
                batch_videos=cfg.batch_videos,
                log=lambda s: print("  " + s))
            warm = res[1:] or res
            wfs = sum(r[2] for r in warm) / len(warm)
            _stage(results, "train_e2e",
                   np.isfinite(wfs) and wfs > 0,
                   f"{n_vid} videos  cold {res[0][2]:,.0f} f/s -> warm "
                   f"{wfs:,.0f} f/s (mean of {len(warm)} epochs)")
        except Exception as exc:  # record FAIL, keep the runbook going
            _stage(results, "train_e2e", False,
                   f"{type(exc).__name__}: {exc}")

    # ---- stage 1b: relation checkpoint convert; stage 4: full eval ----
    if args.relation_ckpt:
        model_path = args.relation_ckpt
        if os.path.isfile(args.relation_ckpt):  # torch .tar -> Orbax
            if args.family == "auto":
                # deserialize the .tar only when the family must be sniffed —
                # a real trained checkpoint is hundreds of MB
                import torch

                from nl_vsgg_tpu.models.convert_ref import detect_family
                raw = torch.load(args.relation_ckpt, map_location="cpu",
                                 weights_only=False)
                family = detect_family(raw.get("state_dict", raw))
                del raw
            else:
                family = args.family
            conv = _load_tool("convert_relation_ckpt")
            model_path = os.path.join(args.out_dir, "relation_orbax")
            conv.main(["--ckpt", args.relation_ckpt, "--out", model_path,
                       "--cfg", args.cfg_file, "--family", family])
            # sidecar so reruns against the converted dir keep the family
            with open(os.path.join(model_path, "family.json"), "w") as f:
                json.dump({"family": family}, f)
            _stage(results, "convert_relation", True,
                   f"family={family} -> {model_path}")
        elif args.family != "auto":
            family = args.family
        else:  # existing Orbax dir: read the conversion sidecar
            sidecar = os.path.join(args.relation_ckpt, "family.json")
            if os.path.isfile(sidecar):
                family = json.load(open(sidecar))["family"]
            else:
                family = "sttran"
                print("[acceptance] WARNING: no family.json next to "
                      f"{args.relation_ckpt}; assuming family=sttran — pass "
                      "--family dsg_detr for a DSG-DETR checkpoint")

        # ---- stage 3b: self-baselining (live torch reference eval) ----
        ref_expected = None
        if args.ref_baseline:
            if not os.path.isdir("/root/reference"):
                _stage(results, "ref_baseline", False,
                       "/root/reference not mounted")
            elif not os.path.isfile(args.relation_ckpt):
                _stage(results, "ref_baseline", False,
                       "--ref_baseline needs the torch .tar checkpoint "
                       "(an Orbax dir cannot drive the reference model)")
            else:
                try:
                    ref_expected, n_ref = run_ref_baseline(
                        cfg, args, args.out_dir, family)
                    exp_path = os.path.join(args.out_dir, "expected.json")
                    with open(exp_path, "w") as f:
                        json.dump(ref_expected, f, indent=1)
                    _stage(results, "ref_baseline", True,
                           f"{n_ref} videos  ref R@20 "
                           f"{ref_expected['recall'].get('20', 0.0):.4f} "
                           f"R@50 {ref_expected['recall'].get('50', 0.0):.4f}"
                           f" -> {exp_path}")
                except Exception as exc:  # record FAIL, keep the runbook going
                    _stage(results, "ref_baseline", False,
                           f"{type(exc).__name__}: {exc}")

        test_mod = _load_tool("test_STTran")
        build_fn = test_mod.build_model
        if family == "dsg_detr":
            build_fn = _load_tool("train_DSG_DETR").build_model
        if cfg.mode == "sgcls":
            # the two-stage classifier-reassignment flow takes cfg directly
            from nl_vsgg_tpu.utils.logging import setup_logger
            ns = argparse.Namespace(model_path=model_path,
                                    max_videos=args.max_videos)
            group_fn = (_load_tool("test_DSG_DETR").sgcls_group_ids
                        if family == "dsg_detr" else None)
            evaluator = test_mod.evaluate_sgcls(cfg, ns, setup_logger(),
                                                build_model_fn=build_fn,
                                                group_id_fn=group_fn)
        else:
            eval_argv = ["--cfg", args.cfg_file, "--model_path", model_path]
            if args.max_videos:
                eval_argv += ["--max_videos", str(args.max_videos)]
            # stage-1 overrides (converted vinvl npz) must reach the eval
            # config: test_STTran resolves `load_config` through its own
            # module namespace, so patch exactly that name
            orig_load = test_mod.load_config
            test_mod.load_config = lambda path, extra=None: orig_load(
                path, {**overrides, **(extra or {})})
            try:
                evaluator = test_mod.main(eval_argv, build_model_fn=build_fn)
            finally:
                test_mod.load_config = orig_load
        # evaluate the detail string only when an evaluator exists — an eval
        # path returning None must record a FAIL stage, not crash the runbook
        detail = ("no evaluator returned" if evaluator is None else
                  f"R@20 {evaluator.mean_score(20):.4f} "
                  f"R@50 {evaluator.mean_score(50):.4f}")
        _stage(results, "eval", evaluator is not None, detail)

        # ---- stage 5: parity gate ----
        if evaluator is not None:
            expected = ref_expected
            if args.expected_json:
                with open(args.expected_json) as f:
                    expected = json.load(f)
            gate_ok = parity_table(evaluator, expected)
            if expected:
                _stage(results, "parity_gate", gate_ok,
                       f"|Δ| <= {GATE_PTS} pts on every expected metric")

    print("\n[acceptance] summary:")
    for name, ok, detail in results:
        print(f"  {'PASS' if ok else 'FAIL'}  {name:<18} {detail}")
    failed = [n for n, ok, _ in results if not ok]
    if failed:
        print(f"[acceptance] FAILED stages: {', '.join(failed)}")
        return 1
    print("[acceptance] all executed stages passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
