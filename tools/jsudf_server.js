#!/usr/bin/env node
/**
 * JavaScript (Node/V8) guest UDF worker for the graft engine — the engine's
 * analogue of the reference's QuickJS runtime surface
 * (arrow-udf-runtime/src/javascript/mod.rs:328-456 scalar/table,
 * :693-935 aggregates): real JavaScript functions — including generator
 * table functions and five-phase aggregates — evaluated in a V8 sidecar
 * process, one per pool slot (the JS analogue of tools/pyudf_server.py).
 *
 * Wire protocol: the same command topology as the Arrow-IPC servers
 * (VERSION / LIST / GET f / CALL f / CALLTABLE f / ACCCREATE f / ACC f /
 * ACCRETRACT f / ACCMERGE f / ACCFINISH f), but CALL bodies are one JSON
 * line instead of an Arrow stream — dependency-free Node has no Arrow
 * reader, and the JSON value space covers the demo type matrix
 * (bool/int32/float64/string plus arrays). int64 is EXACT: the client
 * encodes bigint-typed values as decimal strings on the wire, arguments
 * declared `bigint` reach the function as JS BigInt, and BigInt results
 * are stringified back — no 2^53 rounding (the reference's JS runtime
 * round-trips real i64, `javascript/mod.rs`). Functions may be async /
 * return Promises (reference `javascript/mod.rs:328-456` async support):
 * the worker awaits them — including async generators for table
 * functions — before framing the response:
 *
 *   CALL gcd\n{"cols":[[12,25],[18,15]],"n":2}\n
 *     -> OK\n{"vals":[6,5]}\n
 *   CALLTABLE js_split\n{"cols":[["a b"]],"n":1}\n
 *     -> OK\n{"rows":[0,0],"vals":["a","b"]}\n
 *   ACCCREATE js_sum\n            -> OK\n{"state":0}\n
 *   ACC js_sum\n{"state":0,"cols":[[1,2]],"n":2}\n -> OK\n{"state":3}\n
 *   ACCMERGE js_sum\n{"a":3,"b":4}\n               -> OK\n{"state":7}\n
 *   ACCFINISH js_sum\n{"state":7}\n                -> OK\n{"value":7}\n
 *
 * Null handling is ReturnNullOnNullInput (a null argument row yields null /
 * no table rows); a per-row exception yields null for that row — the guest
 * never kills the exchange. Request-level failures resolve to structured
 * `ERR {"name":...,"message":...}\n` status lines (v4).
 *
 * Containment (v4): every function evaluates on a worker_thread, and each
 * request carries a wall-clock deadline (--call-timeout-ms, default 30000;
 * 0 disables) — the reference's QuickJS timeout analogue
 * (javascript/mod.rs:229-260). A runaway SYNC loop cannot be preempted
 * in-process, so on deadline the worker thread is terminated and respawned
 * (built-ins re-created, DEFINE'd functions replayed from the main-thread
 * log); the stuck call resolves to ERR {"name":"TimeoutError",...}. Other
 * in-flight calls fail with {"name":"WorkerRestart",...} rather than hang.
 * The worker also carries a V8 old-gen heap cap (--max-heap-mb, default 512;
 * the reference's memory-limit half of javascript/mod.rs:229-260): a
 * memory-hog guest is killed by V8 with ERR_WORKER_OUT_OF_MEMORY, resolves
 * to ERR {"name":"MemoryLimitError",...}, and the worker respawns — the
 * server process never OOMs.
 * Wire-shipped DEFINE source additionally evaluates in a vm context with
 * language built-ins + deliberate capabilities (fetch, timers) but no
 * process/require — a privilege cut (not a hard boundary; Node vm caveat)
 * so hostile defines degrade to per-row errors. --load files are trusted.
 *
 * Usage: node tools/jsudf_server.js --port 0 [--load extra_funcs.js]
 *        [--call-timeout-ms 30000] [--max-defines 4096] [--max-line-mb 64]
 *        [--max-heap-mb 512]  (0 disables the guest V8 old-gen cap)
 * Prints `PORT <bound-port>` on stdout once listening.
 */
"use strict";

const net = require("net");
const { Worker, isMainThread, parentPort, workerData } = require("worker_threads");

// v4: structured ERR objects + per-call guest deadline on a terminable
// worker thread (v3 added BigInt-exact int64 as decimal strings)
const PROTOCOL_VERSION = 4;

// ---------------------------------------------------------------------------
// Registry (signature grammar mirrors graft.sig.Signature)
// ---------------------------------------------------------------------------

const SCALARS = new Map(); // name -> {sig, fn, batch?}
const TABLES = new Map(); // name -> {sig, fn}  (fn is a generator/iterable fn)
const AGGS = new Map(); // name -> {sig, impl}

function parseSig(text) {
  let head, ret, isTable;
  if (text.includes("->>")) {
    [head, ret] = text.split("->>");
    isTable = true;
  } else {
    [head, ret] = text.split("->");
    ret = ret.trim();
    isTable = ret.toLowerCase().startsWith("setof ");
    if (isTable) ret = ret.slice("setof ".length);
  }
  const open = head.indexOf("(");
  const close = head.lastIndexOf(")");
  return {
    name: head.slice(0, open).trim().toLowerCase(),
    args: head.slice(open + 1, close).split(",").map((s) => s.trim()).filter(Boolean),
    ret: ret.trim(),
    isTable,
    render() {
      return `${this.name}(${this.args.join(",")}) ${this.isTable ? "->>" : "->"} ${this.ret}`;
    },
  };
}

const registry = {
  scalar(sig, fn) {
    const s = parseSig(sig);
    SCALARS.set(s.name, { sig: s, fn });
  },
  /** Batched (column-at-a-time) scalar — the reference's JS batched mode
   * (javascript/mod.rs:536-625): fn receives one Array per argument column
   * (nulls in place) and returns the result column. One guest call per
   * request instead of per row; the wire is already columnar, so this is
   * free of re-framing. */
  scalarBatch(sig, fn) {
    const s = parseSig(sig);
    SCALARS.set(s.name, { sig: s, fn, batch: true });
  },
  table(sig, fn) {
    const s = parseSig(sig);
    TABLES.set(s.name, { sig: s, fn });
  },
  /** impl: {createState, accumulate, retract?, merge, finish} — the
   * reference's five-phase aggregate surface on a plain JS object. */
  aggregate(sig, impl) {
    const s = parseSig(sig);
    AGGS.set(s.name, { sig: s, impl });
  },
};

// ---------------------------------------------------------------------------
// Built-in demo functions (the worker's conformance set — REAL JavaScript:
// arrow fns, destructuring, generators, closures)
// ---------------------------------------------------------------------------

registry.scalar("gcd(int, int) -> int", (a, b) => {
  a = Math.abs(a);
  b = Math.abs(b);
  while (b) [a, b] = [b, a % b];
  return a;
});

registry.scalar("js_upper(string) -> string", (s) => s.toUpperCase());

registry.scalar("js_quality(string) -> float64", (s) => {
  // toy quality heuristic: alpha ratio x log-length saturation
  const alpha = (s.match(/[A-Za-z]/g) || []).length;
  return s.length === 0 ? 0 : (alpha / s.length) * Math.min(1, Math.log10(1 + s.length) / 3);
});

registry.scalar("js_div(int, int) -> int", (a, b) => {
  // integer division; the error message rides the CALLERR error column
  if (b === 0) throw new RangeError("division by zero");
  return Math.trunc(a / b);
});

registry.table("js_split(string) ->> string", function* (s) {
  // ASCII whitespace class (not \s: JS \s also matches unicode spaces,
  // which would diverge from the python worker and the engine tokenizer)
  for (const tok of s.split(/[ \t\n\r\f\v]+/)) if (tok) yield tok;
});

registry.table("js_series(int) ->> int", function* (n) {
  for (let i = 0; i < n; i++) yield i;
});

registry.aggregate("js_sum(int) -> bigint", {
  createState: () => 0,
  accumulate: (s, x) => (x == null ? s : s + x),
  retract: (s, x) => (x == null ? s : s - x),
  merge: (a, b) => a + b,
  finish: (s) => s,
});

// BigInt kernel: the multiply pushes intermediates past 2^53, so a
// Number-based wire would silently round — this function is the wire's
// int64-exactness conformance probe.
registry.scalar(
  "js_hash64(bigint) -> bigint",
  (k) => (k * 1099511627776n + 987654321n) % 2305843009213693951n
);

// async scalar: the worker awaits the Promise before framing the response
registry.scalar("js_async_add(int, int) -> int", async (a, b) => {
  await new Promise((r) => setImmediate(r));
  return a + b;
});

// batched (column-at-a-time) demo: z-score over the request's column — a
// kernel that NEEDS the whole column (mean/stddev) and shows the one-call-
// per-batch shape; nulls pass through
registry.scalarBatch("js_zscore(float64) -> float64", (xs) => {
  const live = xs.filter((v) => v != null);
  const n = live.length;
  if (n === 0) return xs.map(() => null);
  const mean = live.reduce((a, b) => a + b, 0) / n;
  const sd = Math.sqrt(live.reduce((a, b) => a + (b - mean) * (b - mean), 0) / n) || 1;
  return xs.map((v) => (v == null ? null : (v - mean) / sd));
});

// ---------------------------------------------------------------------------
// Row helpers
// ---------------------------------------------------------------------------

function* rowsOf(body) {
  const { cols, n } = body;
  for (let i = 0; i < (n || 0); i++) yield cols.map((c) => c[i]);
}

/** Wire → JS value coercion by declared type: `bigint` args become real
 * BigInt (the client sends them as decimal strings for exactness); any other
 * numeric arg that arrived as a string becomes a Number. */
function coerceVal(declared, v) {
  if (v == null) return v;
  const t = (declared || "").toLowerCase();
  if (t === "bigint" || t === "int64") return typeof v === "bigint" ? v : BigInt(v);
  if (typeof v === "string" && t && t !== "string" && t !== "varchar" && t !== "json")
    return Number(v);
  return v;
}

function coerceArgs(sig, row) {
  return row.map((v, i) => coerceVal(sig.args[i], v));
}

/** Await a function result if it is a Promise (async scalar support). */
async function resolved(v) {
  return v && typeof v.then === "function" ? await v : v;
}

async function handleCall(fname, isTable, body) {
  if (isTable) {
    const fd = TABLES.get(fname.toLowerCase());
    if (!fd) return { err: `no table function ${fname}` };
    const rows = [];
    const vals = [];
    let i = 0;
    for (const row of rowsOf(body)) {
      if (!row.some((v) => v == null)) {
        try {
          // a table fn may be a sync generator, an async generator, or an
          // async fn resolving to an iterable — await the call, then
          // `for await` drives either iteration protocol
          let it = fd.fn(...coerceArgs(fd.sig, row));
          if (it && typeof it.then === "function") it = await it;
          for await (const v of it) {
            rows.push(i);
            vals.push(v === undefined ? null : v);
          }
        } catch (e) {
          /* per-row failure yields no rows */
        }
      }
      i++;
    }
    return { rows, vals };
  }
  const fd = SCALARS.get(fname.toLowerCase());
  if (!fd) return { err: `no scalar function ${fname}` };
  if (fd.batch) {
    // column-at-a-time: ONE guest call for the whole request; bigint-typed
    // columns are coerced element-wise before the call
    const n = body.n || 0;
    const cols = body.cols.map((c, i) => c.map((v) => coerceVal(fd.sig.args[i], v)));
    try {
      const out = await resolved(fd.fn(...cols));
      if (!Array.isArray(out) || out.length !== n)
        return { err: `batch function ${fname} returned ${out && out.length} values for ${n} rows` };
      return { vals: out.map((v) => (v === undefined ? null : v)) };
    } catch (e) {
      return { err: `batch function ${fname} failed: ${e.message || e}` };
    }
  }
  const vals = [];
  for (const row of rowsOf(body)) {
    if (row.some((v) => v == null)) {
      vals.push(null);
      continue;
    }
    try {
      const v = await resolved(fd.fn(...coerceArgs(fd.sig, row)));
      vals.push(v === undefined ? null : v);
    } catch (e) {
      vals.push(null); // per-row failure yields null
    }
  }
  return { vals };
}

// Fallible scalar call: per-row failures surface as an `errs` column
// ("ErrType: message", like the reference JS runtime's error strings)
// instead of silent nulls.
async function handleCallErr(fname, body) {
  const fd = SCALARS.get(fname.toLowerCase());
  if (!fd) return { err: `no scalar function ${fname}` };
  if (fd.batch) return { err: `${fname} is batched: no per-row error capture` };
  const vals = [];
  const errs = [];
  for (const row of rowsOf(body)) {
    if (row.some((v) => v == null)) {
      vals.push(null);
      errs.push(null);
      continue;
    }
    try {
      const v = await resolved(fd.fn(...coerceArgs(fd.sig, row)));
      vals.push(v === undefined ? null : v);
      errs.push(null);
    } catch (e) {
      vals.push(null);
      errs.push(`${e.constructor ? e.constructor.name : "Error"}: ${e.message || e}`);
    }
  }
  return { vals, errs };
}

async function handleAgg(verb, fname, body) {
  const fd = AGGS.get(fname.toLowerCase());
  if (!fd) return { err: `no aggregate ${fname}` };
  const impl = fd.impl;
  switch (verb) {
    case "ACCCREATE":
      return { state: await resolved(impl.createState()) };
    case "ACC":
    case "ACCRETRACT": {
      const fn = verb === "ACCRETRACT" ? impl.retract : impl.accumulate;
      if (!fn) return { err: `${fname} is append-only` };
      let s = body.state;
      for (const row of rowsOf(body)) s = await resolved(fn(s, ...coerceArgs(fd.sig, row)));
      return { state: s };
    }
    case "ACCMERGE":
      return { state: await resolved(impl.merge(body.a, body.b)) };
    case "ACCFINISH":
      return { value: await resolved(impl.finish(body.state)) };
    default:
      return { err: `bad agg verb ${verb}` };
  }
}

// ---------------------------------------------------------------------------
// Wire protocol: newline-framed commands; CALL/ACC bodies are one JSON line
// ---------------------------------------------------------------------------

const BODY_VERBS = new Set(["CALL", "CALLERR", "CALLTABLE", "ACC", "ACCRETRACT", "ACCMERGE", "ACCFINISH", "DEFINE"]);

// Evaluation context for DEFINE'd (wire-shipped) source: language built-ins
// plus deliberate capabilities (fetch, timers) — no `process`, no `require`,
// no worker internals. Node's vm is NOT a hard security boundary (documented
// caveat); this is a privilege cut so a hostile define degrades to per-row
// errors instead of reaching the host. Built-ins and --load files are
// trusted and keep full access.
let guestCtx = null;
function guestContext() {
  if (!guestCtx) {
    const vm = require("vm");
    const g = {
      Math, JSON, BigInt, Number, String, Array, Object, Boolean, Date,
      parseInt, parseFloat, isNaN, isFinite, RegExp, Error, TypeError,
      RangeError, SyntaxError, EvalError, URIError, Promise, Symbol, Map,
      Set, WeakMap, WeakSet, Uint8Array, Int32Array, Float64Array,
      ArrayBuffer, TextEncoder, TextDecoder, encodeURIComponent,
      decodeURIComponent, setTimeout, clearTimeout, setImmediate,
      fetch: typeof fetch === "function" ? fetch : undefined,
      console: { log: () => {}, error: () => {} },
    };
    g.globalThis = g;
    guestCtx = vm.createContext(g);
  }
  return guestCtx;
}

// Dynamic registration from source — the reference's Runtime.add_function
// surface (javascript/mod.rs add_function: name + type + JS code shipped at
// runtime). body: {kind: "scalar"|"table"|"aggregate", sig, code} where
// `code` is a JS expression (arrow fn, function/generator expression, or an
// object with the five aggregate methods).
function handleDefine(body) {
  const { kind, sig, code } = body;
  let value;
  try {
    // compile deadline only — runtime deadlines come from the worker-thread
    // terminate path
    value = require("vm").runInContext(`"use strict"; (${code})`, guestContext(), { timeout: 5000 });
  } catch (e) {
    return { err: `define failed: ${e.constructor ? e.constructor.name : "Error"}: ${e.message}` };
  }
  try {
    if (kind === "scalar") registry.scalar(sig, value);
    else if (kind === "batch") registry.scalarBatch(sig, value);
    else if (kind === "table") registry.table(sig, value);
    else if (kind === "aggregate") registry.aggregate(sig, value);
    else return { err: `define failed: bad kind ${kind}` };
  } catch (e) {
    return { err: `define failed: ${e.message}` };
  }
  return { ok: true };
}

// BigInt results (and BigInt aggregate state) serialize as decimal strings —
// the exact-int64 half of the wire contract; the client re-parses by the
// declared return type.
function stringifyBody(out) {
  return JSON.stringify(out, (k, v) => (typeof v === "bigint" ? v.toString() : v));
}

/** Structured ERR status line: name + message survive the wire so the
 * engine can distinguish a timeout from a missing function from a guest
 * bug (reference error strings carry the error type the same way). */
function errLine(e) {
  const o =
    typeof e === "string"
      ? { name: "Error", message: e }
      : { name: (e && e.name) || (e && e.constructor && e.constructor.name) || "Error", message: (e && e.message) || String(e) };
  return "ERR " + JSON.stringify(o) + "\n";
}

// ---------------------------------------------------------------------------
// Worker side: all function evaluation happens here, on a terminable thread
// ---------------------------------------------------------------------------

function loadFile(path) {
  // extra user functions: a JS file calling registry.scalar/table/aggregate
  new Function("registry", require("fs").readFileSync(path, "utf8"))(registry);
}

/** Full response text for one request — the worker owns formatting so the
 * main thread only does socket framing and deadlines. */
async function respondText(verbLine, fname, body) {
  const sp = verbLine.indexOf(" ");
  const verb = sp < 0 ? verbLine : verbLine.slice(0, sp);
  if (verb === "VERSION") return `OK\n${PROTOCOL_VERSION}\n\n`;
  if (verb === "LIST") {
    const sigs = [];
    for (const m of [SCALARS, TABLES, AGGS])
      for (const { sig } of m.values()) sigs.push(sig.render());
    sigs.sort();
    return "OK\n" + sigs.map((s) => s + "\n").join("") + "\n";
  }
  if (verb === "GET") {
    const hits = [];
    for (const m of [SCALARS, TABLES, AGGS]) {
      const fd = m.get(fname.toLowerCase());
      if (fd) hits.push(fd.sig.render());
    }
    return hits.length ? "OK\n" + hits.join("\n") + "\n\n" : errLine(`no function ${fname}`);
  }
  const out =
    verb === "DEFINE"
      ? handleDefine(body)
      : verb === "CALLERR"
        ? await handleCallErr(fname, body)
        : verb === "CALL" || verb === "CALLTABLE"
          ? await handleCall(fname, verb === "CALLTABLE", body)
          : await handleAgg(verb, fname, body || {});
  if (out.err) return errLine(out.err);
  return "OK\n" + stringifyBody(out) + "\n";
}

function workerMain() {
  for (const f of workerData.loadFiles) loadFile(f);
  for (const d of workerData.defines) handleDefine(d); // replay after a restart
  parentPort.on("message", async ({ id, verbLine, fname, body }) => {
    let text;
    try {
      text = await respondText(verbLine, fname, body);
    } catch (e) {
      text = errLine(e);
    }
    parentPort.postMessage({ id, text });
  });
}

// ---------------------------------------------------------------------------
// Main side: socket framing + per-call deadline over the worker thread
// ---------------------------------------------------------------------------

/** Owns the evaluation worker: request fan-in, the per-call wall-clock
 * deadline, and terminate-and-respawn on timeout. DEFINE bodies are logged
 * here so a respawned worker replays them before serving. */
class GuestHost {
  constructor(loadFiles, timeoutMs, maxDefines = 4096, maxLineBytes = 64 * 1024 * 1024,
              maxHeapMb = 512) {
    this.loadFiles = loadFiles;
    this.timeoutMs = timeoutMs;
    this.maxDefines = maxDefines;       // cap on DISTINCT live definitions
    this.maxLineBytes = maxLineBytes;   // framing cap per protocol line
    this.maxHeapMb = maxHeapMb;         // V8 old-gen cap on the guest worker
    this.defines = [];
    this.pending = new Map(); // id -> {resolve, timer}
    this.nextId = 1;
    this.spawn();
  }

  spawn() {
    // resourceLimits is the memory half of guest containment (the reference
    // sets a per-runtime memory limit next to its timeout,
    // javascript/mod.rs:229-260): V8 kills the worker thread with
    // ERR_WORKER_OUT_OF_MEMORY when the guest heap passes the cap, which
    // lands on the 'error' handler below — the in-flight calls degrade to
    // structured ERR rows and a fresh worker respawns; the server process
    // itself never OOMs on a memory-hog DEFINE.
    this.worker = new Worker(__filename, {
      workerData: { loadFiles: this.loadFiles, defines: this.defines },
      resourceLimits:
        this.maxHeapMb > 0 ? { maxOldGenerationSizeMb: this.maxHeapMb } : undefined,
    });
    this.worker.on("message", ({ id, text }) => {
      const p = this.pending.get(id);
      if (!p) return; // already timed out
      if (p.timer) clearTimeout(p.timer);
      this.pending.delete(id);
      p.resolve(text);
    });
    this.worker.on("error", (e) => {
      const oom = e && e.code === "ERR_WORKER_OUT_OF_MEMORY";
      this.failAll({
        name: oom ? "MemoryLimitError" : "WorkerError",
        message: oom
          ? `guest exceeded the ${this.maxHeapMb} MB heap limit; worker restarted`
          : (e && e.message) || String(e),
      });
      this.spawn();
    });
    // a guest calling process.exit() kills the worker thread without an
    // 'error' event — without this, pending calls would hang forever when
    // the deadline is disabled
    const w = this.worker;
    w.on("exit", () => {
      if (this.worker !== w) return; // superseded by a respawn we initiated
      this.failAll({ name: "WorkerExit", message: "guest worker exited unexpectedly; respawned" });
      this.spawn();
    });
  }

  request(verbLine, fname, body) {
    return new Promise((resolve) => {
      const id = this.nextId++;
      const timer =
        this.timeoutMs > 0 ? setTimeout(() => this.onTimeout(id), this.timeoutMs) : null;
      this.pending.set(id, { resolve, timer });
      this.worker.postMessage({ id, verbLine, fname, body });
    });
  }

  onTimeout(id) {
    const p = this.pending.get(id);
    if (!p) return;
    this.pending.delete(id);
    p.resolve(
      "ERR " +
        JSON.stringify({
          name: "TimeoutError",
          message: `guest call exceeded ${this.timeoutMs} ms; worker terminated and respawned`,
        }) +
        "\n"
    );
    // a stuck sync loop never yields — terminating the thread is the only
    // preemption; everything else in flight fails fast instead of hanging
    const stuck = this.worker;
    this.worker.removeAllListeners("error");
    this.failAll({ name: "WorkerRestart", message: "a concurrent call timed out; the guest was restarted" });
    stuck.terminate();
    this.spawn();
  }

  failAll(errObj) {
    for (const p of this.pending.values()) {
      if (p.timer) clearTimeout(p.timer);
      p.resolve("ERR " + JSON.stringify(errObj) + "\n");
    }
    this.pending.clear();
  }
}

function serve(host, sock) {
  sock.setNoDelay(true); // latency-bound write-write-read exchange
  let buf = "";
  let pendingCmd = null; // waiting for this command's JSON body line
  // The protocol is request-response lockstep per connection; this chain
  // keeps response order even if a client pipelines.
  let chain = Promise.resolve();
  const enqueue = (fn) => {
    chain = chain.then(fn).catch((e) => sock.write(errLine(e)));
  };

  const dispatch = (verbLine, fname, body) =>
    enqueue(async () => {
      const verb = verbLine.split(" ", 1)[0];
      if (verb === "DEFINE" && host.defines.length >= host.maxDefines &&
          !host.defines.some((d) => d.kind === body.kind && d.sig === body.sig)) {
        // resource cap, checked BEFORE the guest compiles anything: the
        // replay log (re-applied on every respawn) must stay bounded
        sock.write(errLine({ name: "DefineLimit",
          message: `define log at cap ${host.maxDefines}` }));
        return;
      }
      const text = await host.request(verbLine, fname, body);
      if (verb === "DEFINE" && text.startsWith("OK")) {
        // redefinition keeps ONE live entry per (kind, sig): replay order is
        // preserved and the log size tracks distinct functions, not call count
        host.defines = host.defines.filter(
          (d) => !(d.kind === body.kind && d.sig === body.sig));
        host.defines.push(body);
      }
      sock.write(text);
    });

  const overlong = () => {
    sock.write(errLine({ name: "FramingError",
      message: `protocol line exceeds ${host.maxLineBytes} bytes` }));
    sock.destroy();
  };

  sock.on("data", (chunk) => {
    buf += chunk.toString("utf8");
    if (buf.length > host.maxLineBytes && buf.indexOf("\n") < 0) {
      buf = "";
      return overlong(); // unbounded no-newline stream must not OOM the host
    }
    let nl;
    while ((nl = buf.indexOf("\n")) >= 0) {
      const line = buf.slice(0, nl);
      buf = buf.slice(nl + 1);
      if (pendingCmd) {
        const [verbLine, fname] = pendingCmd;
        pendingCmd = null;
        let body;
        try {
          body = JSON.parse(line);
        } catch (e) {
          // through the chain too — a synchronous ERR would overtake an
          // in-flight async response and desync the lockstep framing
          enqueue(() => sock.write(errLine({ name: "SyntaxError", message: `bad json body: ${e.message}` })));
          continue;
        }
        dispatch(verbLine, fname, body);
        continue;
      }
      if (!line) return sock.end();
      const sp = line.indexOf(" ");
      const verb = sp < 0 ? line : line.slice(0, sp);
      const arg = sp < 0 ? "" : line.slice(sp + 1).trim();
      if (BODY_VERBS.has(verb)) {
        pendingCmd = [line, arg]; // body arrives as the next JSON line
      } else if (verb === "VERSION" || verb === "LIST" || verb === "GET" || verb === "ACCCREATE") {
        dispatch(line, arg, null);
      } else {
        enqueue(() => sock.write(errLine(`bad command ${line}`)));
      }
    }
  });
  sock.on("error", () => {});
}

function main() {
  const args = process.argv.slice(2);
  let port = 0;
  let timeoutMs = 30000;
  let maxDefines = 4096;
  let maxLineBytes = 64 * 1024 * 1024;
  let maxHeapMb = 512;
  const loadFiles = [];
  for (let i = 0; i < args.length; i++) {
    if (args[i] === "--port") port = parseInt(args[++i], 10);
    else if (args[i] === "--load") loadFiles.push(require("path").resolve(args[++i]));
    else if (args[i] === "--call-timeout-ms") timeoutMs = parseInt(args[++i], 10);
    else if (args[i] === "--max-defines") maxDefines = parseInt(args[++i], 10);
    else if (args[i] === "--max-line-mb") maxLineBytes = parseInt(args[++i], 10) * 1024 * 1024;
    else if (args[i] === "--max-heap-mb") maxHeapMb = parseInt(args[++i], 10);
  }
  const host = new GuestHost(loadFiles, timeoutMs, maxDefines, maxLineBytes, maxHeapMb);
  const srv = net.createServer((sock) => serve(host, sock));
  srv.listen(port, "127.0.0.1", () => {
    process.stdout.write(`PORT ${srv.address().port}\n`);
  });
}

if (isMainThread) main();
else workerMain();
