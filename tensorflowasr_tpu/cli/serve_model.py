"""Launch the model server (socket front for the C++ serving host).

Loads the latest checkpoint, builds the jitted engines, and serves the
tensor ops (vad / encode / ctc_logits / translate) on a unix socket or
TCP port until interrupted.
"""

from __future__ import annotations

import logging
import sys

from tensorflowasr_tpu.cli.common import (
    build_featurizers,
    config_parser,
    load_config,
)

logger = logging.getLogger(__name__)


def build_chunk_stream_ops(chunk_data_config: str, chunk_model_config: str,
                           n_slots: int = 8, max_wait_ms: float = 8.0,
                           compute_dtype: str = "float32"):
    """Restore the latest ChunkConformer checkpoint and build the
    multi-stream socket op table (stream_info/open/feed/result/close).
    Returns (ops, BatchingStreamFront); ops must run INLINE on connection
    threads (see ModelServer.inline_ops). Compiles the batched tick on
    the calling thread (advance-all-False leaves slot state untouched)."""
    import jax.numpy as jnp
    import numpy as np

    from tensorflowasr_tpu.serve.multi_session import (
        BatchingStreamFront, MultiStreamChunkServer, build_stream_ops)
    from tensorflowasr_tpu.train.chunk_trainer import ChunkTrainer
    from tensorflowasr_tpu.utils.config import UserConfig

    ccfg = UserConfig(chunk_data_config, chunk_model_config)
    cphone_f, cchar_f, _, _, _ = build_featurizers(ccfg)
    ctrainer = ChunkTrainer(ccfg, cphone_f.num_classes, cchar_f.num_classes,
                            compute_dtype=compute_dtype)
    mcfg = ctrainer.model_cfg
    ctrainer.init_state({
        "wav": np.zeros((1, mcfg.chunk_samples), np.float32),
        "extra_phones": np.ones((1, 8), np.int32),
    })
    if not ctrainer.restore():
        logger.warning("no chunk ASR checkpoint; streaming with random init")
    cvars = {"params": ctrainer.state.params}
    if ctrainer.state.batch_stats is not None:
        cvars["batch_stats"] = ctrainer.state.batch_stats
    msrv = MultiStreamChunkServer(
        ctrainer.model, cvars, n_slots=n_slots,
        phone_featurizer=cphone_f, text_featurizer=cchar_f)
    logger.info("compiling %d-slot stream tick...", n_slots)
    msrv._step(cvars,
               jnp.zeros((n_slots, mcfg.chunk_samples), jnp.float32),
               msrv.caches, jnp.zeros((n_slots,), bool),
               jnp.zeros((n_slots,), bool))
    front = BatchingStreamFront(msrv, max_wait_ms=max_wait_ms)
    return build_stream_ops(front), front


def main(argv=None) -> int:
    parser = config_parser(__doc__)
    parser.add_argument("--socket", default=None,
                        help="unix socket path (default: TCP)")
    parser.add_argument("--port", type=int, default=8502)
    parser.add_argument("--vad_data_config", default=None)
    parser.add_argument("--vad_model_config", default=None)
    parser.add_argument("--chunk_data_config", default=None,
                        help="with --chunk_model_config: also serve "
                             "multi-stream chunk ASR (stream_open/feed/"
                             "result/close ops)")
    parser.add_argument("--chunk_model_config", default=None)
    parser.add_argument("--stream_slots", type=int, default=8,
                        help="concurrent chunk-stream slot pool size")
    parser.add_argument("--stream_wait_ms", type=float, default=8.0,
                        help="dynamic-batching coalescing window")
    parser.add_argument("--beam_width", type=int, default=0,
                        help=">0: offline decode uses on-chip CTC prefix "
                             "beam search instead of greedy")
    parser.add_argument("--lm", default=None,
                        help="phone n-gram LM for shallow fusion: .npz "
                             "(cli/train_lm) or .arpa (KenLM text); "
                             "implies --beam_width 8 if unset")
    parser.add_argument("--lm_weight", type=float, default=0.3)
    args = parser.parse_args(argv)
    config = load_config(args)
    phone_f, char_f, _, _, _ = build_featurizers(config)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensorflowasr_tpu.serve.engines import ASREngine, VADEngine
    from tensorflowasr_tpu.serve.model_server import (
        ModelServer, build_asr_ops)
    from tensorflowasr_tpu.train.asr_trainer import CTCTrainer

    trainer = CTCTrainer(config, phone_f.num_classes, char_f.num_classes,
                         blank_id=phone_f.blank,
                         compute_dtype=args.compute_dtype)
    sr = trainer.model_cfg.sample_rate
    example = {
        "wav": jnp.zeros((1, sr), jnp.float32),
        "phones": jnp.ones((1, 4), jnp.int32),
    }
    trainer.init_state(example)
    if not trainer.restore():
        logger.warning("no ASR checkpoint found under %s; serving random "
                       "init", trainer.outdir)
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats is not None:
        variables["batch_stats"] = trainer.state.batch_stats
    ngram = None
    beam_width = args.beam_width
    if args.lm:
        from tensorflowasr_tpu.utils.ngram_lm import NGramLM, lm_pack

        host_lm = (NGramLM.from_arpa(args.lm, phone_f.token_to_index,
                                     phone_f.num_classes)
                   if args.lm.endswith(".arpa") else NGramLM.load(args.lm))
        ngram = lm_pack(host_lm)
        beam_width = beam_width or 8
    asr_engine = ASREngine(trainer.model, variables, sample_rate=sr,
                           text_featurizer=char_f,
                           phone_featurizer=phone_f,
                           beam_width=beam_width, ngram_lm=ngram,
                           lm_weight=args.lm_weight)

    vad_engine = None
    if args.vad_data_config and args.vad_model_config:
        from tensorflowasr_tpu.cli.common import (
            build_vad_model, restore_or_warn)
        from tensorflowasr_tpu.utils.config import UserConfig

        vcfg = UserConfig(args.vad_data_config, args.vad_model_config)
        vad_model, vstate = build_vad_model(vcfg)
        vstate = restore_or_warn(
            vstate, vcfg.section("running_config")["outdir"], "VAD")
        vad_engine = VADEngine(
            vad_model, {"params": vstate.params},
            frame_input=vcfg.section("speech_config")["frame_input"] or 80)

    ops = build_asr_ops(asr_engine, vad_engine)

    # warm up: compile every op on the MAIN thread before accepting
    # connections — jit compiles triggered from handler threads can hang
    # on some backends, and cold first-request latency is bad either way
    logger.info("warming up ops (compiling)...")
    enc = ops["encode"](np.zeros((1, asr_engine.chunk_samples), np.float32))
    logger.info("encode compiled: %s", enc.shape)
    logits = ops["ctc_logits"](enc)
    logger.info("ctc_logits compiled: %s", logits.shape)
    ops["translate"](np.zeros((1, 8), np.int32), enc)
    logger.info("translate compiled")
    vad_frame = (vad_engine.frame_input if vad_engine is not None else 80)
    ops["vad"](np.zeros((1, 10, vad_frame), np.float32))

    inline_ops = set()
    if args.chunk_data_config and args.chunk_model_config:
        stream_ops, _ = build_chunk_stream_ops(
            args.chunk_data_config, args.chunk_model_config,
            n_slots=args.stream_slots, max_wait_ms=args.stream_wait_ms,
            compute_dtype=args.compute_dtype)
        ops.update(stream_ops)
        inline_ops = set(stream_ops)
    logger.info("warmup done")

    server = ModelServer(ops, unix_path=args.socket,
                         tcp_port=None if args.socket else args.port,
                         inline_exec=False, inline_ops=inline_ops)
    server.start()
    endpoint = args.socket or f"127.0.0.1:{server.tcp_port}"
    print(f"model server ready on {endpoint}", flush=True)
    try:
        # op execution (incl. any residual jit compiles) stays on the
        # main thread — daemon-thread compiles can hang on tunneled TPUs
        server.run_worker_loop()
    except KeyboardInterrupt:
        server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
