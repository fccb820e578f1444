"""TTS serving daemon: text→speech over HTTP, co-batched across requests.

Beyond-reference serving surface (the reference synthesizes one utterance
per CLI run, ref: gen_tacotron.py:139-166); this serves concurrent
requests from one chip, sharing every in-flight utterance's vocoder folds
in a single decode launch per step (infer/stream_server.py economics:
16 concurrent 24 s streams at >3x realtime margin each on one v5e).

  python serve.py [--hp_file hparams.py] [--port 8000] [--host 127.0.0.1]
                  [--voc_weights ...] [--tts_weights ...] [--sessions 4]
                  [--deterministic] [--force_cpu]

  curl localhost:8000/health
  curl -X POST localhost:8000/synthesize -d '{"text": "hello"}' -o out.wav
  curl -X POST localhost:8000/stream -d '{"text": "hello"}' -o out.wav -N
"""

import argparse

import jax

from wavernn_tpu.config import hp
from wavernn_tpu.infer.http_server import SynthesisService, make_http_server
from wavernn_tpu.infer.pipeline import TTSPipeline
from wavernn_tpu.models.tacotron import TacotronConfig
from wavernn_tpu.models.wavernn import WaveRNNConfig
from wavernn_tpu.paths import Paths
from wavernn_tpu.text.symbols import symbols
from wavernn_tpu.utils.checkpoints import load_weights
from wavernn_tpu.utils.display import simple_table


def main():
    parser = argparse.ArgumentParser(description="TTS HTTP serving daemon")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--voc_weights", type=str,
                        help="[string/path] alternative WaveRNN weights")
    parser.add_argument("--tts_weights", type=str,
                        help="[string/path] alternative Tacotron weights")
    parser.add_argument("--sessions", type=int, default=4,
                        help="max concurrent vocoder sessions (further "
                             "requests queue)")
    parser.add_argument("--group", type=int, default=16,
                        help="decode steps per scheduling chunk")
    parser.add_argument("--slot_seconds", type=float, default=30.0,
                        help="max audio seconds per session slot")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--deterministic", action="store_true",
                        help="mode/argmax draws: reproducible audio")
    parser.add_argument("--no_warmup", action="store_true",
                        help="skip the startup warm-up synthesis (compiles "
                             "are then paid by the first requests)")
    parser.add_argument("--tts_backend", choices=["auto", "xla", "pallas"],
                        default="auto")
    parser.add_argument("--output_dtype",
                        choices=["int16", "mulaw8", "float64"],
                        default="int16",
                        help="int16 (default): device-faded 16-bit PCM for "
                             "BOTH one-shot and streamed responses — half "
                             "the transfer bytes, no host-side quantization; "
                             "mulaw8: 8-bit mu-law wire bytes off the device "
                             "(half int16 again; expanded to PCM16 on the "
                             "host before WAV framing); "
                             "float64: host-side quantization (debugging)")
    parser.add_argument("--input_dtype",
                        choices=["float32", "float16", "uint8"],
                        default="float16",
                        help="wire dtype for mels staged to the vocoder: "
                             "float16 (default) halves f32 upload bytes at "
                             "no measurable quality cost; uint8 quantizes "
                             "the [0,1] mel to 8-bit steps (quarter of f32, "
                             "measured +5-6%% strict serving rate, MCD "
                             "delta inside the seed spread — "
                             "tools/wire_format_probe.py)")
    parser.add_argument("--mesh", "-m", action="store_true",
                        help="shard the vocoder's fold axis over the device "
                             "mesh (multi-chip sequence-parallel decode; "
                             "uses hp.mesh_shape when set)")
    parser.add_argument("--force_cpu", "-c", action="store_true")
    parser.add_argument("--verbose", action="store_true",
                        help="log every HTTP request")
    parser.add_argument("--hp_file", metavar="FILE", default="hparams.py")
    args = parser.parse_args()

    hp.configure(args.hp_file)
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform
    print("Using device:", jax.devices()[0])

    paths = Paths(hp.data_path, hp.voc_model_id, hp.tts_model_id)

    from gen_tacotron import build_tts_state
    from gen_wavernn import build_state
    from wavernn_tpu.training.tacotron import r_for_step

    voc_cfg = WaveRNNConfig.from_hp(hp)
    voc_state = load_weights(
        build_state(voc_cfg),
        args.voc_weights if args.voc_weights else paths.voc_latest_weights)

    tts_cfg = TacotronConfig.from_hp(hp, num_chars=len(symbols))
    tts_state = load_weights(
        build_tts_state(tts_cfg, hp.tts_schedule[-1][0]),
        args.tts_weights if args.tts_weights else paths.tts_latest_weights)
    r = r_for_step(tts_state.get_step(), hp.tts_schedule)

    mesh = None
    if args.mesh:
        from wavernn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(hp.mesh_shape)
        print(f"Decode mesh: data={mesh.n_data} model={mesh.n_model} "
              f"({len(jax.devices())} devices)")

    backend = "pallas" if platform == "tpu" else "scan"
    int8_gates = bool(hp.get("gen_int8", False))  # same knob the gen CLIs honor
    pipeline = TTSPipeline(
        tts_cfg, {"params": tts_state.params,
                  "batch_stats": tts_state.batch_stats},
        voc_cfg, {"params": voc_state.params,
                  "batch_stats": voc_state.batch_stats},
        cleaner_names=hp.tts_cleaner_names, r=r, backend=backend,
        tts_backend=args.tts_backend, int8_gates=int8_gates,
        deterministic=args.deterministic, mesh=mesh,
        output_dtype=args.output_dtype, input_dtype=args.input_dtype)

    service = SynthesisService(
        pipeline, target=hp.voc_target, overlap=hp.voc_overlap,
        mu_law=hp.mu_law and voc_cfg.mode == "RAW", group=args.group,
        capacity=args.sessions, slot_seconds=args.slot_seconds,
        seed=args.seed)
    httpd = make_http_server(service, args.host, args.port,
                             quiet=not args.verbose)

    if not args.no_warmup:
        # pay both decode paths' compiles before accepting traffic (the
        # first TPU compiles take minutes over a relay)
        import time

        t0 = time.time()
        print("Warming up (compiling both decode paths)...")
        for stream in (False, True):
            for _ in service.submit("warm up.", stream=stream):
                pass
        print(f"Warm-up done in {time.time() - t0:.1f} s")

    simple_table([
        ("WaveRNN", f"{voc_state.get_step() // 1000}k"),
        ("Tacotron", f"{tts_state.get_step() // 1000}k"),
        ("r", r),
        # int8_gates is a pallas-only knob (Generator ignores it on scan),
        # so only advertise it when it is actually in effect
        ("backend", backend + (" (int8)" if int8_gates
                               and backend == "pallas" else "")),
        ("output", args.output_dtype),
        ("input", args.input_dtype),
        ("sessions", args.sessions),
        ("endpoint", f"http://{args.host}:{httpd.server_address[1]}"),
    ])
    print("Serving: POST /synthesize | POST /stream | GET /health "
          "(ctrl-c or SIGTERM to stop)")
    import signal

    def _sigterm(*_):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        # (not shutdown(): that deadlocks when serve_forever has already
        # returned on this same thread)
        httpd.server_close()
        service.close()


if __name__ == "__main__":
    main()
