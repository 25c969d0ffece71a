/* transflow-tpu WebGL2 demo — fully GPU-resident flow transfer.
 *
 * Parity reference: the reference ships a WebGL variant (extra/www) proving
 * the algorithm's data-parallel formulation; this is an independent
 * implementation of the same 3-stage frame graph:
 *   1. flow: one Horn-Schunck-style update per frame from the previous and
 *      current video frames (warm-started from the accumulated field),
 *   2. accumulate: u' = u(p + f(p)) + f(p), then decay toward zero
 *      (backward-mapping displacement accumulation with built-in reset),
 *   3. remap: out(p) = source(p + u(p)) — gather through the accumulated
 *      displacement. The "source" is the first frame grabbed (press Reset
 *      to re-grab).
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

const FLOW_FS = `#version 300 es
precision highp float;
uniform sampler2D prevFrame;
uniform sampler2D currFrame;
uniform sampler2D prevFlow;
uniform vec2 texel;
uniform float gain;
in vec2 uv;
out vec4 outFlow;
float luma(sampler2D t, vec2 p) { return dot(texture(t, p).rgb, vec3(0.299, 0.587, 0.114)); }
void main() {
  // spatial + temporal derivatives (central differences on the mean image)
  float ix = 0.5 * ((luma(prevFrame, uv + vec2(texel.x, 0.)) + luma(currFrame, uv + vec2(texel.x, 0.)))
                  - (luma(prevFrame, uv - vec2(texel.x, 0.)) + luma(currFrame, uv - vec2(texel.x, 0.)))) * 0.5;
  float iy = 0.5 * ((luma(prevFrame, uv + vec2(0., texel.y)) + luma(currFrame, uv + vec2(0., texel.y)))
                  - (luma(prevFrame, uv - vec2(0., texel.y)) + luma(currFrame, uv - vec2(0., texel.y)))) * 0.5;
  float it = luma(currFrame, uv) - luma(prevFrame, uv);
  // neighborhood average of the previous flow (one Jacobi step of
  // Horn-Schunck with alpha regularization)
  vec2 avg = 0.25 * (texture(prevFlow, uv + vec2(texel.x, 0.)).xy
                   + texture(prevFlow, uv - vec2(texel.x, 0.)).xy
                   + texture(prevFlow, uv + vec2(0., texel.y)).xy
                   + texture(prevFlow, uv - vec2(0., texel.y)).xy);
  float alpha = 0.02;
  float denom = alpha + ix * ix + iy * iy;
  float c = (ix * avg.x + iy * avg.y + it) / denom;
  vec2 flow = avg - vec2(ix, iy) * c;
  outFlow = vec4(flow * gain, 0., 1.);
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

const COPY_FS = `#version 300 es
precision highp float;
uniform sampler2D tex;
in vec2 uv;
out vec4 color;
void main() { color = texture(tex, uv); }`;

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
  flow: program(FLOW_FS),
  acc: program(ACC_FS),
  remap: program(REMAP_FS),
  copy: program(COPY_FS),
};

let video = null;
let targets = null;
let sourceGrabbed = false;
let flipAcc = 0;

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

function draw(prog, fbo, textures, uniforms) {
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
  for (const [name, value] of Object.entries(uniforms || {})) {
    if (Array.isArray(value))
      gl.uniform2f(gl.getUniformLocation(prog, name), value[0], value[1]);
    else
      gl.uniform1f(gl.getUniformLocation(prog, name), value);
  }
  gl.drawArrays(gl.TRIANGLE_STRIP, 0, 4);
}

function uploadVideo(target) {
  gl.bindTexture(gl.TEXTURE_2D, target.tex);
  gl.texImage2D(gl.TEXTURE_2D, 0, gl.RGBA8, gl.RGBA, gl.UNSIGNED_BYTE,
                video);
}

let frames = 0;
let lastStamp = performance.now();

function tick() {
  requestAnimationFrame(tick);
  if (!video || video.readyState < 2 || !targets) return;
  // rotate frame textures: curr -> prev, upload new curr
  [targets.prevFrame, targets.currFrame] = [targets.currFrame,
                                            targets.prevFrame];
  uploadVideo(targets.currFrame);
  if (!sourceGrabbed) {
    uploadVideo(targets.source);
    sourceGrabbed = true;
  }
  const gain = parseFloat(document.getElementById("gain").value);
  const decay = parseFloat(document.getElementById("decay").value);
  const texel = [1 / canvas.width, 1 / canvas.height];
  const next = 1 - flipAcc;
  draw(progs.flow, targets.flow[next].fbo, {
    prevFrame: targets.prevFrame.tex,
    currFrame: targets.currFrame.tex,
    prevFlow: targets.flow[flipAcc].tex,
  }, { texel, gain });
  draw(progs.acc, targets.acc[next].fbo, {
    accTex: targets.acc[flipAcc].tex,
    flowTex: targets.flow[next].tex,
  }, { decay });
  draw(progs.remap, null, {
    sourceTex: targets.source.tex,
    accTex: targets.acc[next].tex,
  });
  flipAcc = next;
  frames += 1;
  const now = performance.now();
  if (now - lastStamp > 1000) {
    statusEl.textContent = `${(frames * 1000 / (now - lastStamp)).toFixed(0)} fps — ${canvas.width}x${canvas.height}`;
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

document.getElementById("webcam").addEventListener("click", async () => {
  try {
    const stream = await navigator.mediaDevices.getUserMedia(
      { video: { width: 1280 } });
    attach(stream, true);
  } catch (err) {
    statusEl.textContent = "webcam denied: " + err.message;
  }
});
document.getElementById("file").addEventListener("change", (event) => {
  const file = event.target.files[0];
  if (file) attach(URL.createObjectURL(file), false);
});
document.getElementById("reset").addEventListener("click", () => {
  sourceGrabbed = false;
  clearAcc();
});

tick();
