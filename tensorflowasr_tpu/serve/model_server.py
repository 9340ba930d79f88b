"""Model server: Unix/TCP socket front for the JAX engines.

The C++ serving host (serve/cpp — the TPU-native equivalent of the
reference's Inference/CppInference onnxruntime session) implements wav IO,
the Tokener, the VAD state machine, and CTC greedy decoding natively, and
calls this server only for the three tensor ops that must run on the TPU:

  op "vad"        f32 [1, N, frame]        -> f32 [N]      voice logits
  op "encode"     f32 [1, chunk_samples]   -> f32 [T', d]  encoder output
  op "ctc_logits" f32 [1, T, d]            -> f32 [T, V]   phone logits
  op "translate"  i32 [1, U], f32 [1, T, d]-> f32 [U, Vc]  char logits

Wire protocol (little endian):
  request  = u32 op_len | op utf8 | u32 n_tensors | tensor*
  tensor   = u8 dtype (0=f32, 1=i32) | u32 ndim | u32 dims[ndim] | payload
  response = u32 status (0 ok) | u32 n_tensors | tensor*   (status!=0:
             one i32[0] tensor and a trailing u32 msg_len + utf8 message)
"""

from __future__ import annotations

import logging
import os
import socket
import struct
import threading
from typing import Callable, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_DTYPES = {0: np.float32, 1: np.int32}
_DTYPE_CODES = {np.dtype(np.float32): 0, np.dtype(np.int32): 1}


def _read_exact(conn: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        part = conn.recv(n - len(buf))
        if not part:
            raise ConnectionError("peer closed")
        buf += part
    return buf


def read_tensor(conn: socket.socket) -> np.ndarray:
    dtype_code = struct.unpack("<B", _read_exact(conn, 1))[0]
    ndim = struct.unpack("<I", _read_exact(conn, 4))[0]
    dims = struct.unpack(f"<{ndim}I", _read_exact(conn, 4 * ndim))
    dtype = _DTYPES[dtype_code]
    count = int(np.prod(dims)) if dims else 1
    data = _read_exact(conn, count * dtype().itemsize)
    return np.frombuffer(data, dtype=dtype).reshape(dims)


def encode_tensor(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    if arr.dtype not in _DTYPE_CODES:
        # normalize common widths so ops may return int64/float64
        arr = arr.astype(np.int32 if np.issubdtype(arr.dtype, np.integer)
                         else np.float32)
    code = _DTYPE_CODES[arr.dtype]
    return (struct.pack("<B", code) + struct.pack("<I", arr.ndim)
            + struct.pack(f"<{arr.ndim}I", *arr.shape) + arr.tobytes())


def write_tensor(conn: socket.socket, arr: np.ndarray) -> None:
    conn.sendall(encode_tensor(np.asarray(arr)))


class ModelServer:
    """Serves named tensor ops over a Unix (or TCP) socket.

    Socket IO runs in per-connection threads; op EXECUTION is funneled
    through one queue so it can run on a single thread — call
    :meth:`run_worker_loop` from the main thread for backends where jit
    compilation must not happen on daemon threads (e.g. remote TPU
    tunnels), or pass ``inline_exec=True`` to execute directly in the
    handler threads (fine on CPU).
    """

    def __init__(self, ops: Dict[str, Callable[..., np.ndarray]],
                 unix_path: Optional[str] = None,
                 tcp_port: Optional[int] = None,
                 inline_exec: bool = True,
                 inline_ops: Optional[set] = None):
        self.ops = ops
        self.unix_path = unix_path
        self.tcp_port = tcp_port
        self.inline_exec = inline_exec
        # ops that run on the CONNECTION thread even when inline_exec is
        # False — required for blocking/coalescing ops (the multi-stream
        # feed waits for the batching ticker; on the single worker thread
        # that wait would serialize all clients and defeat batching)
        self.inline_ops = inline_ops or set()
        self._sock: Optional[socket.socket] = None
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()
        import queue

        self._work: "queue.Queue" = queue.Queue()

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> None:
        if self.unix_path:
            if os.path.exists(self.unix_path):
                os.unlink(self.unix_path)
            self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self._sock.bind(self.unix_path)
        else:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._sock.bind(("127.0.0.1", self.tcp_port or 0))
            self.tcp_port = self._sock.getsockname()[1]
        self._sock.listen(4)
        self._sock.settimeout(0.2)
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        logger.info("model server listening on %s",
                    self.unix_path or f"127.0.0.1:{self.tcp_port}")

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if self._sock is not None:
            self._sock.close()
        if self.unix_path and os.path.exists(self.unix_path):
            os.unlink(self.unix_path)

    def run_worker_loop(self) -> None:
        """Execute queued ops on the CALLING thread until stop()."""
        import queue

        while not self._stop.is_set():
            try:
                fn, args, done = self._work.get(timeout=0.2)
            except queue.Empty:
                continue
            try:
                done["result"] = fn(*args)
            except Exception as e:  # noqa: BLE001 - forwarded to client
                done["error"] = e
            done["event"].set()

    def _execute(self, fn, args):
        if self.inline_exec:
            return fn(*args)
        done = {"event": threading.Event()}
        self._work.put((fn, args, done))
        done["event"].wait()
        if "error" in done:
            raise done["error"]
        return done["result"]

    # -- serving ------------------------------------------------------------
    def _serve(self) -> None:
        assert self._sock is not None
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            t = threading.Thread(target=self._handle_conn, args=(conn,),
                                 daemon=True)
            t.start()

    def _handle_conn(self, conn: socket.socket) -> None:
        try:
            conn.settimeout(60)
            while not self._stop.is_set():
                try:
                    op_len = struct.unpack("<I", _read_exact(conn, 4))[0]
                except (ConnectionError, socket.timeout):
                    return
                op = _read_exact(conn, op_len).decode("utf-8")
                n = struct.unpack("<I", _read_exact(conn, 4))[0]
                tensors = [read_tensor(conn) for _ in range(n)]
                try:
                    fn = self.ops[op]
                    if op in self.inline_ops:
                        out = fn(*tensors)
                    else:
                        out = self._execute(fn, tensors)
                    if isinstance(out, np.ndarray):
                        out = [out]
                    # serialize FULLY before sending: a failure mid-response
                    # would otherwise desynchronize the wire protocol
                    payload = b"".join(encode_tensor(np.asarray(t))
                                       for t in out)
                    conn.sendall(struct.pack("<II", 0, len(out)) + payload)
                except Exception as e:  # noqa: BLE001 - report to client
                    logger.exception("op %s failed", op)
                    msg = str(e).encode("utf-8")[:1000]
                    conn.sendall(
                        struct.pack("<II", 1, 1)
                        + encode_tensor(np.zeros((0,), np.int32))
                        + struct.pack("<I", len(msg)) + msg)
        finally:
            conn.close()


def build_asr_ops(asr_engine, vad_engine=None) -> Dict[str, Callable]:
    """Standard op table over the serving engines."""
    import jax.numpy as jnp

    model = asr_engine.model
    variables = asr_engine.variables

    def _enc2d(enc: np.ndarray) -> np.ndarray:
        """Accept [T, d] or [1, T, d]."""
        if enc.ndim == 3:
            enc = enc.reshape(-1, enc.shape[-1])
        return enc

    def encode(wav: np.ndarray) -> np.ndarray:
        return asr_engine.extract_feature(wav.reshape(-1))

    def ctc_logits(enc: np.ndarray) -> np.ndarray:
        from tensorflowasr_tpu.models.conformer import ConformerCTC
        out = model.apply(variables, jnp.asarray(_enc2d(enc)[None]),
                          method=ConformerCTC.ctc_logits)
        return np.asarray(out)[0]

    def translate(ids: np.ndarray, enc: np.ndarray) -> np.ndarray:
        from tensorflowasr_tpu.models.conformer import ConformerCTC
        out = model.apply(variables, jnp.asarray(ids.reshape(1, -1)),
                          jnp.asarray(_enc2d(enc)[None]),
                          method=ConformerCTC.translate)
        return np.asarray(out)[0]

    def info() -> np.ndarray:
        """[chunk_samples, sample_rate, dmodel] — clients size their feed
        chunks from this instead of guessing (an unquantized guess used to
        be silently truncated)."""
        return np.asarray([asr_engine.chunk_samples,
                           asr_engine.sample_rate,
                           asr_engine.model.cfg.dmodel], np.int32)

    ops = {"encode": encode, "ctc_logits": ctc_logits,
           "translate": translate, "info": info}
    if vad_engine is not None:
        ops["vad"] = lambda frames: vad_engine.inference(frames)
    else:
        # energy fallback: positive logit for frames whose SPL clears the
        # SilenceDetector threshold — keeps the serving session usable
        # before a VAD model is trained
        from tensorflowasr_tpu.serve.vad_machine import SilenceDetector

        sd = SilenceDetector()

        def energy_vad(frames: np.ndarray) -> np.ndarray:
            f = frames.reshape(-1, frames.shape[-1])
            spl = np.asarray([sd.sound_pressure_level(row) for row in f])
            return (spl - sd.threshold).astype(np.float32)

        ops["vad"] = energy_vad
    return ops


class ModelClient:
    """Python-side client (protocol reference + test double for the C++
    client)."""

    def __init__(self, unix_path: Optional[str] = None,
                 tcp_port: Optional[int] = None):
        if unix_path:
            self.sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            self.sock.connect(unix_path)
        else:
            self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self.sock.connect(("127.0.0.1", tcp_port))

    def call(self, op: str, *tensors: np.ndarray) -> List[np.ndarray]:
        enc = op.encode("utf-8")
        self.sock.sendall(struct.pack("<I", len(enc)) + enc)
        self.sock.sendall(struct.pack("<I", len(tensors)))
        for t in tensors:
            write_tensor(self.sock, np.asarray(t))
        status = struct.unpack("<I", _read_exact(self.sock, 4))[0]
        n = struct.unpack("<I", _read_exact(self.sock, 4))[0]
        out = [read_tensor(self.sock) for _ in range(n)]
        if status != 0:
            msg_len = struct.unpack("<I", _read_exact(self.sock, 4))[0]
            msg = _read_exact(self.sock, msg_len).decode("utf-8")
            raise RuntimeError(f"server error for op {op}: {msg}")
        return out

    def close(self):
        self.sock.close()
