"""Training CLI — reference-parity `train.py` (ref /root/reference/train.py).

Epoch/iter loop with periodic display/print/save and per-epoch LR stepping.
The reference's `time.sleep(160)` between epochs and `sleep(36)` every 1000
steps (ref train.py:28-29, 59-62) were GPU-thermal folklore, not semantics —
intentionally not reproduced (SURVEY.md section 5.3).

    python train.py --dataroot <root> --name exp --model dec_vit \
        --dataset_mode dec_vit --model_G iid_hlgvit_crs_gd4_cfs_v3 \
        --n_feats 24 --hidden_dim_ratio 4 --sb
"""

import logging
import time



def main(argv=None):
    from cfen_vit_tpu.config import parse_args
    from cfen_vit_tpu.data import create_dataloader
    from cfen_vit_tpu.models.dehazing_model import create_model
    from cfen_vit_tpu.utils import Visualizer

    cfg = parse_args(argv, is_train=True)
    data_loader = create_dataloader(cfg)
    dataset = data_loader.load_data()
    dataset_size = len(data_loader)
    logging.info("#training images = %d", dataset_size)

    model = create_model(cfg)
    model.setup(cfg)
    visualizer = Visualizer(cfg)
    if cfg.verbose:
        from cfen_vit_tpu.utils import print_networks
        if getattr(model, "state", None):
            nets = {"G": model.state["g"],
                    **{f"D_{k}": v for k, v in model.state["d"].items()}}
        else:
            nets = {}
        if nets:
            print_networks(nets, verbose=True)
    total_steps = 0

    import jax as _jax
    _jax.config.update("jax_default_matmul_precision", cfg.precision)

    for epoch in range(cfg.epoch_count, cfg.niter + cfg.niter_decay + 1):
        epoch_start_time = time.time()
        iter_data_time = time.time()
        epoch_iter = 0
        for i, data in enumerate(dataset):
            iter_start_time = time.time()
            if total_steps % cfg.print_freq == 0:
                t_data = iter_start_time - iter_data_time
            visualizer.reset()
            total_steps += cfg.batchSize
            epoch_iter += cfg.batchSize
            if cfg.trace_dir and total_steps == 10 * cfg.batchSize:
                import jax as _j
                _j.profiler.start_trace(cfg.trace_dir)
            model.set_input(data)
            model.optimize_parameters(cfg)
            if cfg.trace_dir and total_steps == 15 * cfg.batchSize:
                import jax as _j
                _j.profiler.stop_trace()

            if total_steps % cfg.display_freq == 0:
                save_result = total_steps % cfg.update_html_freq == 0
                visualizer.display_current_results(
                    model.get_current_visuals(), epoch, save_result)

            if total_steps % cfg.print_freq == 0:
                losses = model.get_current_losses()
                t = (time.time() - iter_start_time) / cfg.batchSize
                visualizer.print_current_losses(epoch, epoch_iter, losses,
                                                t, t_data)

            if total_steps % cfg.save_latest_freq == 0:
                logging.info("saving the latest model (epoch %d, "
                             "total_steps %d)", epoch, total_steps)
                model.save_networks("latest")
            iter_data_time = time.time()

        if epoch % cfg.save_epoch_freq == 0:
            logging.info("saving the model at the end of epoch %d, iters %d",
                         epoch, total_steps)
            model.save_networks("latest")
            model.save_networks(epoch)

        print(f"End of epoch {epoch} / {cfg.niter + cfg.niter_decay} \t "
              f"Time Taken: {int(time.time() - epoch_start_time)} sec")
        model.update_learning_rate()


if __name__ == "__main__":
    main()
