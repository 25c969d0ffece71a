/* transflow-tpu WebGL2 demo — fully GPU-resident flow transfer.
 *
 * Parity reference: the reference ships a WebGL variant (extra/www,
 * transflow.js:942-1024 + shaders/) proving the algorithm's data-parallel
 * formulation; this is an independent WebGL2 implementation of the same
 * frame graph with the same three estimator families:
 *   1. flow: Horn-Schunck (iterated Jacobi passes), Lucas-Kanade
 *      (Gaussian-weighted structure tensor + 2x2 solve), or point matching
 *      (windowed SSD block search) on the previous/current video frames,
 *   2. accumulate: u' = u(p + f(p)) + f(p), then decay toward zero
 *      (backward-mapping displacement accumulation with built-in reset),
 *   3. remap: out(p) = source(p + u(p)) — gather through the accumulated
 *      displacement; or a flow-visualization mode (flow * scale + 0.5).
 * The pixmap ("source") is the first frame grabbed, a chosen image file, or
 * the live video when "live pixmap" is on; flow and pixmap can be locked
 * independently.
 */
"use strict";

const canvas = document.getElementById("canvas");
const gl = canvas.getContext("webgl2");
const statusEl = document.getElementById("status");
if (!gl) statusEl.textContent = "WebGL2 unavailable";
gl.getExtension("EXT_color_buffer_float");

const QUAD_VS = `#version 300 es
precision highp float;
const vec2 pos[4] = vec2[4](vec2(-1.,-1.), vec2(1.,-1.), vec2(-1.,1.), vec2(1.,1.));
out vec2 uv;
void main() {
  uv = pos[gl_VertexID] * 0.5 + 0.5;
  gl_Position = vec4(pos[gl_VertexID], 0., 1.);
}`;

const LUMA = `
uniform bool mirrorX;
float luma(sampler2D t, vec2 p) {
  if (mirrorX) p.x = 1.0 - p.x;
  return dot(texture(t, p).rgb, vec3(0.299, 0.587, 0.114));
}`;

// --- estimator 1: Horn-Schunck (one Jacobi pass; iterated by ping-pong) ---
const FLOW_HS_FS = `#version 300 es
precision highp float;
uniform sampler2D prevFrame;
uniform sampler2D currFrame;
uniform sampler2D prevFlow;
uniform vec2 texel;
uniform float gain;
uniform float warm;   // 0 on the first pass of a frame, 1 on refinements
in vec2 uv;
out vec4 outFlow;
${LUMA}
void main() {
  float ix = 0.5 * ((luma(prevFrame, uv + vec2(texel.x, 0.)) + luma(currFrame, uv + vec2(texel.x, 0.)))
                  - (luma(prevFrame, uv - vec2(texel.x, 0.)) + luma(currFrame, uv - vec2(texel.x, 0.)))) * 0.5;
  float iy = 0.5 * ((luma(prevFrame, uv + vec2(0., texel.y)) + luma(currFrame, uv + vec2(0., texel.y)))
                  - (luma(prevFrame, uv - vec2(0., texel.y)) + luma(currFrame, uv - vec2(0., texel.y)))) * 0.5;
  float it = luma(currFrame, uv) - luma(prevFrame, uv);
  vec2 avg = warm * 0.25 * (texture(prevFlow, uv + vec2(texel.x, 0.)).xy
                          + texture(prevFlow, uv - vec2(texel.x, 0.)).xy
                          + texture(prevFlow, uv + vec2(0., texel.y)).xy
                          + texture(prevFlow, uv - vec2(0., texel.y)).xy);
  float alpha = 0.02;
  float denom = alpha + ix * ix + iy * iy;
  float c = (ix * avg.x + iy * avg.y + it) / denom;
  vec2 flow = avg - vec2(ix, iy) * c;
  outFlow = vec4(flow * gain, 0., 1.);
}`;

// --- estimator 2: Lucas-Kanade (Gaussian-weighted structure tensor) ------
const FLOW_LK_FS = `#version 300 es
precision highp float;
uniform sampler2D prevFrame;
uniform sampler2D currFrame;
uniform vec2 texel;
uniform float gain;
uniform int window_;      // odd, <= 15
uniform float threshold;  // squared-norm cutoff in uv units
in vec2 uv;
out vec4 outFlow;
${LUMA}
void main() {
  mat2 ata = mat2(0.);
  vec2 atb = vec2(0.);
  int half_ = window_ / 2;
  for (int j = 0; j < 15; j++) {
    if (j >= window_) break;
    for (int i = 0; i < 15; i++) {
      if (i >= window_) break;
      vec2 d = vec2(float(j - half_), float(i - half_));
      float w = exp(-0.5 * dot(d, d));
      vec2 p = uv + d * texel;
      float v = luma(currFrame, p);
      float it = luma(prevFrame, p) - v;
      float ix = luma(currFrame, p + vec2(texel.x, 0.)) - v;
      float iy = luma(currFrame, p + vec2(0., texel.y)) - v;
      ata += w * mat2(ix * ix, ix * iy, ix * iy, iy * iy);
      atb -= w * vec2(it * ix, it * iy);
    }
  }
  // smallest eigenvalue of the structure tensor gates degenerate solves
  float m = 0.5 * (ata[0][0] + ata[1][1]);
  float det = ata[0][0] * ata[1][1] - ata[0][1] * ata[1][0];
  float eMin = m - sqrt(max(m * m - det, 0.));
  vec2 flow = vec2(0.);
  if (eMin > 1e-3 && det != 0.) {
    flow = mat2(ata[1][1], -ata[0][1], -ata[1][0], ata[0][0]) * atb / det;
    flow *= texel;   // pixel units -> uv units
    if (threshold > 0. && dot(flow, flow) < threshold) flow = vec2(0.);
  }
  outFlow = vec4(flow * gain, 0., 1.);
}`;

// --- estimator 3: point matching (windowed SSD block search) -------------
const FLOW_PM_FS = `#version 300 es
precision highp float;
uniform sampler2D prevFrame;
uniform sampler2D currFrame;
uniform vec2 texel;
uniform float gain;
uniform int window_;     // search window (odd, <= 11)
uniform int patch;       // SSD patch (odd, <= 7)
uniform float minMove;   // skip search when the pixel barely changed
in vec2 uv;
out vec4 outFlow;
${LUMA}
float ssd(vec2 offset) {
  float acc = 0.;
  float total = 0.;
  int half_ = patch / 2;
  for (int i = 0; i < 7; i++) {
    if (i >= patch) break;
    for (int j = 0; j < 7; j++) {
      if (j >= patch) break;
      vec2 d = vec2(float(j - half_), float(i - half_));
      float w = exp(-0.5 * dot(d, d));
      float a = luma(currFrame, uv + d * texel);
      float b = luma(prevFrame, uv + offset + d * texel);
      acc += w * (a - b) * (a - b);
      total += w;
    }
  }
  return acc / total;
}
void main() {
  vec2 best = vec2(0.);
  if (abs(luma(prevFrame, uv) - luma(currFrame, uv)) >= minMove) {
    float bestDiff = 1e9;
    int half_ = window_ / 2;
    for (int j = 0; j < 11; j++) {
      if (j >= window_) break;
      for (int i = 0; i < 11; i++) {
        if (i >= window_) break;
        vec2 off = vec2(float(j - half_), float(i - half_)) * texel;
        float diff = ssd(off);
        bool center = (i == half_ && j == half_);
        // prefer the null displacement on near-ties (stability)
        if (diff < bestDiff - 0.005 || (center && diff < bestDiff + 0.005)) {
          bestDiff = diff;
          best = off;
        }
      }
    }
  }
  outFlow = vec4(best * gain, 0., 1.);
}`;

const ACC_FS = `#version 300 es
precision highp float;
uniform sampler2D accTex;
uniform sampler2D flowTex;
uniform float decay;
in vec2 uv;
out vec4 outAcc;
void main() {
  vec2 f = texture(flowTex, uv).xy;
  // pull the accumulated displacement from where this pixel came from,
  // then add the new step; decay implements a continuous soft reset
  vec2 u = texture(accTex, uv + f).xy + f;
  u -= sign(u) * decay * abs(u);
  outAcc = vec4(u, 0., 1.);
}`;

const REMAP_FS = `#version 300 es
precision highp float;
uniform sampler2D sourceTex;
uniform sampler2D accTex;
in vec2 uv;
out vec4 color;
void main() {
  vec2 u = texture(accTex, uv).xy;
  color = vec4(texture(sourceTex, uv + u).rgb, 1.);
}`;

// flow visualization: scaled displacement around mid-gray (x->R, y->G)
const SHOWFLOW_FS = `#version 300 es
precision highp float;
uniform sampler2D flowTex;
uniform float scale;
in vec2 uv;
out vec4 color;
void main() {
  vec2 f = texture(flowTex, uv).xy;
  color = vec4(scale * f.x + 0.5, scale * f.y + 0.5, 0.5, 1.);
}`;

function compile(type, src) {
  const shader = gl.createShader(type);
  gl.shaderSource(shader, src);
  gl.compileShader(shader);
  if (!gl.getShaderParameter(shader, gl.COMPILE_STATUS))
    throw new Error(gl.getShaderInfoLog(shader));
  return shader;
}

function program(fs) {
  const p = gl.createProgram();
  gl.attachShader(p, compile(gl.VERTEX_SHADER, QUAD_VS));
  gl.attachShader(p, compile(gl.FRAGMENT_SHADER, fs));
  gl.linkProgram(p);
  if (!gl.getProgramParameter(p, gl.LINK_STATUS))
    throw new Error(gl.getProgramInfoLog(p));
  return p;
}

function makeTarget(w, h, float) {
  const tex = gl.createTexture();
  gl.bindTexture(gl.TEXTURE_2D, tex);
  gl.texImage2D(gl.TEXTURE_2D, 0, float ? gl.RGBA16F : gl.RGBA8, w, h, 0,
                gl.RGBA, float ? gl.HALF_FLOAT : gl.UNSIGNED_BYTE, null);
  gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_MIN_FILTER, gl.LINEAR);
  gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_MAG_FILTER, gl.LINEAR);
  gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_WRAP_S, gl.CLAMP_TO_EDGE);
  gl.texParameteri(gl.TEXTURE_2D, gl.TEXTURE_WRAP_T, gl.CLAMP_TO_EDGE);
  const fbo = gl.createFramebuffer();
  gl.bindFramebuffer(gl.FRAMEBUFFER, fbo);
  gl.framebufferTexture2D(gl.FRAMEBUFFER, gl.COLOR_ATTACHMENT0,
                          gl.TEXTURE_2D, tex, 0);
  return { tex, fbo };
}

const progs = {
  hs: program(FLOW_HS_FS),
  lk: program(FLOW_LK_FS),
  pm: program(FLOW_PM_FS),
  acc: program(ACC_FS),
  remap: program(REMAP_FS),
  show: program(SHOWFLOW_FS),
};

let video = null;
let targets = null;
let sourceGrabbed = false;
let bitmapImage = null;     // chosen pixmap image, overrides the first grab
let flipAcc = 0;
let flipFlow = 0;

const ui = (id) => document.getElementById(id);
const uiVal = (id) => parseFloat(ui(id).value);
const uiChecked = (id) => ui(id).checked;

function setupTargets(w, h) {
  canvas.width = w;
  canvas.height = h;
  targets = {
    prevFrame: makeTarget(w, h, false),
    currFrame: makeTarget(w, h, false),
    flow: [makeTarget(w, h, true), makeTarget(w, h, true)],
    acc: [makeTarget(w, h, true), makeTarget(w, h, true)],
    source: makeTarget(w, h, false),
  };
  sourceGrabbed = false;
  clearAcc();
}

function clearAcc() {
  for (const t of [...(targets ? targets.acc : []),
                   ...(targets ? targets.flow : [])]) {
    gl.bindFramebuffer(gl.FRAMEBUFFER, t.fbo);
    gl.clearColor(0, 0, 0, 1);
    gl.clear(gl.COLOR_BUFFER_BIT);
  }
}

function draw(prog, fbo, textures, floats, ints) {
  gl.bindFramebuffer(gl.FRAMEBUFFER, fbo);
  gl.viewport(0, 0, canvas.width, canvas.height);
  gl.useProgram(prog);
  let unit = 0;
  for (const [name, tex] of Object.entries(textures)) {
    gl.activeTexture(gl.TEXTURE0 + unit);
    gl.bindTexture(gl.TEXTURE_2D, tex);
    gl.uniform1i(gl.getUniformLocation(prog, name), unit);
    unit += 1;
  }
  for (const [name, value] of Object.entries(floats || {})) {
    if (Array.isArray(value))
      gl.uniform2f(gl.getUniformLocation(prog, name), value[0], value[1]);
    else
      gl.uniform1f(gl.getUniformLocation(prog, name), value);
  }
  for (const [name, value] of Object.entries(ints || {}))
    gl.uniform1i(gl.getUniformLocation(prog, name), value);
  gl.drawArrays(gl.TRIANGLE_STRIP, 0, 4);
}

function uploadImage(target, image) {
  gl.bindTexture(gl.TEXTURE_2D, target.tex);
  gl.texImage2D(gl.TEXTURE_2D, 0, gl.RGBA8, gl.RGBA, gl.UNSIGNED_BYTE,
                image);
}

let frames = 0;
let lastStamp = performance.now();

function tick() {
  requestAnimationFrame(tick);
  if (!video || video.readyState < 2 || !targets) return;
  const method = ui("method").value;
  const view = ui("view").value;
  const lockFlow = uiChecked("lockflow");
  const livePixmap = uiChecked("livepixmap");
  const mirror = uiChecked("mirror") ? 1 : 0;
  // rotate frame textures: curr -> prev, upload new curr
  [targets.prevFrame, targets.currFrame] = [targets.currFrame,
                                            targets.prevFrame];
  uploadImage(targets.currFrame, video);
  if (!sourceGrabbed || livePixmap) {
    uploadImage(targets.source, bitmapImage && !livePixmap ? bitmapImage
                                                           : video);
    sourceGrabbed = true;
  }
  const gain = uiVal("gain");
  const decay = uiVal("decay");
  const texel = [1 / canvas.width, 1 / canvas.height];
  if (!lockFlow) {
    if (method === "hs") {
      // iterated Jacobi passes ping-pong between the two flow targets;
      // warm=0 on the first pass re-linearizes from zero each frame
      const iters = Math.max(1, uiVal("iterations") | 0);
      for (let i = 0; i < iters; i++) {
        const next = 1 - flipFlow;
        draw(progs.hs, targets.flow[next].fbo, {
          prevFrame: targets.prevFrame.tex,
          currFrame: targets.currFrame.tex,
          prevFlow: targets.flow[flipFlow].tex,
        }, { texel, gain, warm: i === 0 ? 0 : 1 }, { mirrorX: mirror });
        flipFlow = next;
      }
    } else if (method === "lk") {
      const next = 1 - flipFlow;
      draw(progs.lk, targets.flow[next].fbo, {
        prevFrame: targets.prevFrame.tex,
        currFrame: targets.currFrame.tex,
      }, { texel, gain, threshold: uiVal("threshold") * 1e-6 },
         { window_: Math.max(3, uiVal("window") | 1), mirrorX: mirror });
      flipFlow = next;
    } else {
      const next = 1 - flipFlow;
      draw(progs.pm, targets.flow[next].fbo, {
        prevFrame: targets.prevFrame.tex,
        currFrame: targets.currFrame.tex,
      }, { texel, gain, minMove: uiVal("threshold") * 0.01 },
         { window_: Math.min(11, Math.max(3, uiVal("window") | 1)),
           patch: 5, mirrorX: mirror });
      flipFlow = next;
    }
  }
  if (view === "flow") {
    draw(progs.show, null, { flowTex: targets.flow[flipFlow].tex },
         { scale: 20.0 * canvas.width });
  } else {
    const next = 1 - flipAcc;
    draw(progs.acc, targets.acc[next].fbo, {
      accTex: targets.acc[flipAcc].tex,
      flowTex: targets.flow[flipFlow].tex,
    }, { decay });
    draw(progs.remap, null, {
      sourceTex: targets.source.tex,
      accTex: targets.acc[next].tex,
    });
    flipAcc = next;
  }
  frames += 1;
  const now = performance.now();
  if (now - lastStamp > 1000) {
    statusEl.textContent = `${(frames * 1000 / (now - lastStamp)).toFixed(0)} fps — ${canvas.width}x${canvas.height} — ${method}`;
    frames = 0;
    lastStamp = now;
  }
}

function attach(stream_or_url, isStream) {
  video = document.createElement("video");
  video.muted = true;
  video.loop = !isStream;
  video.playsInline = true;
  if (isStream) video.srcObject = stream_or_url;
  else video.src = stream_or_url;
  video.addEventListener("loadeddata", () => {
    const w = Math.min(video.videoWidth, 1280);
    const h = Math.round(w * video.videoHeight / video.videoWidth);
    setupTargets(w, h);
    statusEl.textContent = "running";
  });
  video.play();
}

ui("webcam").addEventListener("click", async () => {
  try {
    const stream = await navigator.mediaDevices.getUserMedia(
      { video: { width: 1280 } });
    attach(stream, true);
  } catch (err) {
    statusEl.textContent = "webcam denied: " + err.message;
  }
});
ui("file").addEventListener("change", (event) => {
  const file = event.target.files[0];
  if (file) attach(URL.createObjectURL(file), false);
});
ui("bitmap").addEventListener("change", (event) => {
  const file = event.target.files[0];
  if (!file) return;
  const img = new Image();
  img.onload = () => {
    bitmapImage = img;
    sourceGrabbed = false;   // re-grab with the new pixmap
  };
  img.src = URL.createObjectURL(file);
});
ui("reset").addEventListener("click", () => {
  sourceGrabbed = false;
  clearAcc();
});
ui("method").addEventListener("change", () => clearAcc());

tick();
