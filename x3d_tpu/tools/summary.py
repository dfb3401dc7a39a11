"""Model summary tool — the analog of the reference's ``X3D.summary``.

The reference committed Keras ``summary()`` dumps per variant
(``models/*/X3D_*.txt``) as de-facto golden files for architecture
correctness (SURVEY.md §4).  This CLI prints per-module parameter counts,
BN-statistic counts, and the activation shape flowing out of every stage,
and can write the same golden files for this framework::

    python -m x3d_tpu.tools.summary --variant=M
    python -m x3d_tpu.tools.summary --all --output_dir=model_summaries
"""

from __future__ import annotations

import io


def summarize(variant: str) -> str:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from x3d_tpu import variant_config
    from x3d_tpu.models import build_arch, create_model

    cfg = variant_config(variant)
    arch = build_arch(cfg)
    model = create_model(cfg, dtype=jnp.float32)
    T, S = cfg.DATA.TEMP_DURATION, cfg.DATA.TRAIN_CROP_SIZE
    x = jnp.zeros((1, T, S, S, 3))
    shapes = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, train=False,
                           return_logits=True))

    def count(tree):
        return sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(tree))

    out = io.StringIO()
    w = out.write
    w(f'Model: X3D-{variant}  (input 1 x {T} x {S} x {S} x 3, NDHWC)\n')
    w("=" * 78 + "\n")
    w(f'{"module":<28}{"output shape":<26}{"params":>12}{"bn stats":>12}\n')
    w("-" * 78 + "\n")

    params, stats = shapes["params"], shapes["batch_stats"]
    t, h = T, S // 2
    w(f'{"conv_1 (stem)":<28}{str((1, t, h, h, arch.conv1_dim)):<26}'
      f'{count(params["conv_1"]):>12}{count(stats.get("conv_1", {})):>12}\n')
    for si, blocks in enumerate(arch.stages):
        h //= 2
        p = n = 0
        for bi in range(len(blocks)):
            key = f"stage{si + 2}_block{bi}"
            p += count(params[key])
            n += count(stats.get(key, {}))
        shape = (1, t, h, h, blocks[0].out_channels)
        w(f'{f"stage{si + 2} ({len(blocks)} blocks)":<28}{str(shape):<26}'
          f'{p:>12}{n:>12}\n')
    w(f'{"conv_5":<28}{str((1, t, h, h, arch.conv5_dim)):<26}'
      f'{count(params["conv_5"]):>12}{count(stats.get("bn_5", {})):>12}\n')
    w(f'{"pool_5 + fc_1":<28}{str((1, arch.head_dim)):<26}'
      f'{count(params["fc_1"]):>12}{0:>12}\n')
    w(f'{"fc_2":<28}{str((1, arch.num_classes)):<26}'
      f'{count(params["fc_2"]):>12}{0:>12}\n')
    w("-" * 78 + "\n")
    total_p, total_s = count(params), count(stats)
    w(f'Trainable params:     {total_p:,}\n')
    w(f'BN running statistics:{total_s:>12,}\n')
    w(f'Total:                {total_p + total_s:,}\n')
    return out.getvalue()


def main(argv=None):
    from absl import app, flags

    flags.DEFINE_string("variant", None, "XS/S/M/L/XL")
    flags.DEFINE_bool("all", False, "Summarise every variant.")
    flags.DEFINE_string("output_dir", None, "Write golden files here.")
    FLAGS = flags.FLAGS

    def run(_):
        import os

        from x3d_tpu import VARIANTS

        names = list(VARIANTS) if FLAGS.all else [FLAGS.variant]
        for name in names:
            text = summarize(name)
            if FLAGS.output_dir:
                os.makedirs(FLAGS.output_dir, exist_ok=True)
                path = os.path.join(FLAGS.output_dir, f"X3D_{name}.txt")
                with open(path, "w") as f:
                    f.write(text)
                print("wrote", path)
            else:
                print(text)

    app.run(run, argv=argv)


if __name__ == "__main__":
    main()
