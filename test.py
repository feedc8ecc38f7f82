"""Inference CLI — reference-parity `test.py` (ref /root/reference/test.py).

Runs the generator over `<dataroot>/hazy/*.png`, writes
`results/<name>/<phase>_<which_epoch>/images/<img>_<label>.png` and an
index.html gallery.  Canonical invocation (README.md:22):

    python test.py --dataroot R --name iid_hlgvit_crs_gd4_cfs_v3_reside \
        --n_feats 24 --hidden_dim_ratio 4 --sb --out_all --which_epoch 32 \
        --model dec_vit --dataset_mode dec_vit \
        --model_G iid_hlgvit_crs_gd4_cfs_v3

Differences vs the reference (documented, not bugs): `--out_all` keeps only
fake_A visuals as there (ref test.py:47-55); the gallery index.html is
actually written (the reference builds the HTML object but never saves it);
the whole batch runs as ONE jit-compiled TPU program.
"""

import logging
import os
import time

import jax


def main(argv=None):
    from cfen_vit_tpu.config import parse_args
    from cfen_vit_tpu.data import create_dataloader
    from cfen_vit_tpu.models.dehazing_model import create_model
    from cfen_vit_tpu.utils import HTML, save_images

    cfg = parse_args(argv, is_train=False)
    data_loader = create_dataloader(cfg)
    dataset = data_loader.load_data()
    model = create_model(cfg)
    model.setup(cfg)
    if cfg.verbose:
        from cfen_vit_tpu.utils import print_networks
        print_networks({"G": model.params}, verbose=True)

    web_dir = os.path.join(cfg.results_dir, cfg.name,
                           f"{cfg.phase}_{cfg.which_epoch}")
    webpage = HTML(web_dir, f"Experiment = {cfg.name}, Phase = {cfg.phase}, "
                            f"Epoch = {cfg.which_epoch}")

    n_images, t0 = 0, time.time()
    n_steady, t_first_done = 0, None
    with jax.default_matmul_precision(cfg.precision):
        for i, data in enumerate(dataset):
            if i >= cfg.how_many:
                break
            model.set_input(data)
            visuals = model.test(cfg)
            if cfg.out_all:
                visuals = {k: v for k, v in visuals.items() if "fake_A" in k}
            img_path = model.get_image_paths()
            if i % 5 == 0:
                logging.info("processing (%04d)-th image...",
                             i * cfg.batchSize)
            save_images(webpage.get_image_dir(), visuals, img_path,
                        aspect_ratio=cfg.aspect_ratio,
                        width=cfg.display_winsize, webpage=webpage)
            n_images += len(img_path)
            if t_first_done is None:
                # batch 0 carries the jit compile (or the persistent-cache
                # deserialize); steady-state throughput excludes it
                t_first_done = time.time()
            else:
                n_steady += len(img_path)
    webpage.save()
    dt = time.time() - t0
    steady = ""
    if n_steady:
        ss = n_steady / max(time.time() - t_first_done, 1e-9)
        steady = f" (steady {ss:.2f} img/s after batch 0)"
    print(f"processed {n_images} images in {dt:.2f}s "
          f"({n_images / max(dt, 1e-9):.2f} img/s){steady} -> {web_dir}")


if __name__ == "__main__":
    main()
