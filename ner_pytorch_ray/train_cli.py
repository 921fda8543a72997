"""Distributed-training entrypoint — the ``train.py`` lifecycle analog
(/root/reference/train.py:404-516: epoch loop, loss backward, clip + SGD,
dev-F1 early-stopping checkpoint), driven over Ray Data:

    python -m ner_pytorch_ray.train_cli --sf_dir /root/testdata/sf0.001 \
        --epochs 10 --lr 6.0 --checkpoint /tmp/best.npz [--labels gazetteer]

Per epoch: ONE fused distributed pass (analytic CRF-head gradients +
dev-F1, integer-summed partials — bit-identical under any partitioning),
one driver-side SGD+momentum+clip step, and an EarlyStopping-gated
checkpoint (pytorchtools.py:50-57 semantics; the saved npz loads directly
into the inference TaggerActor).

Adversarial-loss mixing (train.py:421-470):

    ... --adv_order rep --adv_mode dynamic --launch_epoch 1 \
        --adv_ratio 0.5 --adv_warmup_epochs 2

adds a per-epoch adversarial gradient pass over a packed variant cache
(grad = (1-ratio)*clean + ratio*adv, WarmupWeight ratio schedule);
"dynamic" ranks each sentence's variants by current-head NLL and keeps
the top --adv_topk (dynamic_inference), "non_gradient" uses all variants.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="Ray Data CRF-head training")
    p.add_argument("--sf_dir", default="/root/testdata/sf0.001")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=6.0)
    p.add_argument("--lr_decay", type=float, default=0.3)
    p.add_argument("--momentum", type=float, default=0.5)
    p.add_argument("--clip", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--dev_mod", type=int, default=5)
    p.add_argument(
        "--labels",
        choices=["teacher", "gazetteer"],
        default="teacher",
        help="teacher = realizable distillation labels; gazetteer = corpus annotation",
    )
    p.add_argument("--patience", type=int, default=7)
    p.add_argument("--checkpoint", default=None, help="npz path for the best head")
    p.add_argument(
        "--features",
        default=None,
        help="parquet dir for the backbone feature cache (persists across "
        "runs; a rerun skips the expensive backbone pass)",
    )
    p.add_argument(
        "--adv_order",
        default=None,
        help="adversarial stage list (e.g. 'rep' or 'rep,ppdb') to mix "
        "into the loss; omit for clean training",
    )
    p.add_argument(
        "--adv_mode", choices=["dynamic", "non_gradient"], default="dynamic"
    )
    p.add_argument("--adv_topk", type=int, default=5)
    p.add_argument("--adv_n_variants", type=int, default=2)
    p.add_argument(
        "--launch_epoch",
        type=int,
        default=0,
        help="0-based epoch index at which adv mixing starts",
    )
    p.add_argument("--adv_ratio", type=float, default=0.5)
    p.add_argument("--adv_warmup_epochs", type=int, default=2)
    args = p.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", include_dashboard=False)
    try:
        from ner_pytorch_ray.pipelines.training import train_loop

        curve = train_loop(
            args.sf_dir,
            n_epochs=args.epochs,
            lr=args.lr,
            lr_decay=args.lr_decay,
            momentum=args.momentum,
            clip=args.clip,
            seed=args.seed,
            dev_mod=args.dev_mod,
            labels=args.labels,
            checkpoint_path=args.checkpoint,
            features_path=args.features,
            patience=args.patience,
            adv_order=args.adv_order,
            adv_mode=args.adv_mode,
            adv_topk=args.adv_topk,
            adv_n_variants=args.adv_n_variants,
            launch_epoch=args.launch_epoch,
            adv_ratio=args.adv_ratio,
            adv_warmup_epochs=args.adv_warmup_epochs,
        )
        d = curve.to_pydict()
        for i in range(len(d["epoch"])):
            line = (
                f"epoch {d['epoch'][i]:3d}  n_train {d['n_train'][i]:6d}  "
                f"mean_nll {d['mean_nll'][i]:10.4f}  dev_f1 {d['dev_f1'][i]:8.4f}"
            )
            if "ratio" in d:
                line += (
                    f"  n_adv {d['n_adv'][i]:5d}  "
                    f"adv_nll {d['mean_nll_adv'][i]:10.4f}  "
                    f"ratio {d['ratio'][i]:.3f}"
                )
            print(line)
        best = max(d["dev_f1"])
        print(f"best dev F1: {best:.4f}")
        return 0
    finally:
        if owns:
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
