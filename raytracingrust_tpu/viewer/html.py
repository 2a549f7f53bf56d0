"""The single-page UI (vanilla JS, no CDN — pods have no egress).

Layout mirrors the reference app: framebuffer left (the pixels surface,
src/main.rs:92-111), settings panel right (src/gui.rs:212-339) with the
"Render Image" button, the "Last render took" label, the continuous-render
checkbox and the device label.  The panel is rendered generically from the
/api/state widget schema (viewer/editable.py), the Editable-trait analog.
"""

PAGE = r"""<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>raytracingrust-tpu viewer</title>
<style>
  :root { color-scheme: dark; }
  body { margin: 0; display: flex; height: 100vh; background: #1b1b1f;
         color: #ddd; font: 13px system-ui, sans-serif; }
  #view { flex: 1; display: flex; align-items: center; justify-content: center;
          overflow: auto; }
  #frame { image-rendering: pixelated; max-width: 100%; max-height: 100%;
           background: #000; }
  #panel { width: 340px; overflow-y: auto; background: #26262b;
           border-left: 1px solid #000; padding: 10px 14px; }
  h3 { margin: 14px 0 6px; font-size: 12px; text-transform: uppercase;
       letter-spacing: .06em; color: #9a9aa5; }
  .row { display: flex; align-items: center; gap: 6px; margin: 4px 0; }
  .row label { flex: 1; min-width: 0; overflow: hidden;
               text-overflow: ellipsis; white-space: nowrap; }
  input[type=range] { flex: 1.2; }
  input[type=number] { width: 64px; background: #1b1b1f; color: #ddd;
                       border: 1px solid #444; border-radius: 3px; }
  input[type=color] { width: 36px; height: 22px; border: none; padding: 0;
                      background: none; }
  select { background: #1b1b1f; color: #ddd; border: 1px solid #444; }
  button { background: #3a6ea5; color: #fff; border: none; border-radius: 4px;
           padding: 6px 12px; cursor: pointer; margin: 6px 4px 6px 0; }
  button:hover { background: #4a7eb5; }
  #status { color: #8f8; } #error { color: #f88; white-space: pre-wrap; }
  .val { width: 54px; text-align: right; color: #9a9aa5; }
</style>
</head>
<body>
<div id="view"><img id="frame" alt="render"></div>
<div id="panel">
  <h3>Render</h3>
  <button id="render">Render Image</button>
  <span class="row"><label><input type="checkbox" id="continuous" checked>
    Continuous render</label></span>
  <div id="status">–</div>
  <div id="device"></div>
  <div id="error"></div>
  <div id="controls"></div>
  <h3>Scene</h3>
  <div class="row"><input type="text" id="savepath" value="scene_out.json"
       style="flex:1;background:#1b1b1f;color:#ddd;border:1px solid #444">
    <button id="save">Save JSON</button></div>
</div>
<script>
"use strict";
const $ = id => document.getElementById(id);
const post = (url, body) => fetch(url, {method: "POST",
  body: JSON.stringify(body || {})}).then(r => r.json());

let values = {};
const debounce = {};
function edit(path, value) {
  values[path] = value;
  clearTimeout(debounce[path]);
  debounce[path] = setTimeout(() => post("/api/edit", {[path]: value}), 150);
}

const hex = c => "#" + c.map(v => Math.round(Math.min(Math.max(v,0),1)*255)
  .toString(16).padStart(2, "0")).join("");
const unhex = s => [1,3,5].map(i => parseInt(s.slice(i,i+2),16)/255);

function widgetRow(w) {
  const row = document.createElement("div");
  row.className = "row";
  const label = document.createElement("label");
  label.textContent = w.label;
  label.title = w.label;
  row.appendChild(label);
  const v = values[w.path];
  if (w.widget === "slider") {
    const s = document.createElement("input");
    s.type = "range";
    s.min = w.log ? Math.log(w.min) : w.min;
    s.max = w.log ? Math.log(w.max) : w.max;
    s.step = w.log ? 0.01 : (w.int ? 1 : 0.1);
    s.value = w.log ? Math.log(v) : v;
    const out = document.createElement("span");
    out.className = "val";
    out.textContent = v;
    s.oninput = () => {
      let x = parseFloat(s.value);
      if (w.log) x = Math.exp(x);
      if (w.int) x = Math.round(x);
      out.textContent = w.int ? x : x.toFixed(1);
      edit(w.path, x);
    };
    row.append(s, out);
  } else if (w.widget === "drag") {
    const n = document.createElement("input");
    n.type = "number"; n.step = w.speed || 0.1; n.value = v;
    if (w.min !== undefined) n.min = w.min;
    n.onchange = () => edit(w.path, parseFloat(n.value));
    row.appendChild(n);
  } else if (w.widget === "color") {
    const c = document.createElement("input");
    c.type = "color"; c.value = hex(v);
    // HDR-safe numeric fallback for components > 1 (emission strength)
    const n = document.createElement("input");
    n.type = "text"; n.size = 9; n.value = v.map(x=>+x.toFixed(2)).join(",");
    n.style.cssText = "background:#1b1b1f;color:#ddd;border:1px solid #444";
    c.oninput = () => { const rgb = unhex(c.value);
      n.value = rgb.map(x=>+x.toFixed(2)).join(","); edit(w.path, rgb); };
    n.onchange = () => { const rgb = n.value.split(",").map(parseFloat);
      if (rgb.length === 3 && rgb.every(x=>!isNaN(x))) edit(w.path, rgb); };
    row.append(c, n);
  } else if (w.widget === "vec3") {
    for (let i = 0; i < 3; i++) {
      const n = document.createElement("input");
      n.type = "number"; n.step = w.speed || 0.1; n.value = v[i];
      n.onchange = () => {
        const nv = values[w.path].slice();
        nv[i] = parseFloat(n.value);
        edit(w.path, nv);
      };
      row.appendChild(n);
    }
  } else if (w.widget === "combo") {
    const s = document.createElement("select");
    for (const o of w.options) {
      const opt = document.createElement("option");
      opt.value = opt.textContent = o;
      if (o === v) opt.selected = true;
      s.appendChild(opt);
    }
    s.onchange = () => edit(w.path, s.value);
    row.appendChild(s);
  } else if (w.widget === "checkbox") {
    const c = document.createElement("input");
    c.type = "checkbox"; c.checked = !!v;
    c.onchange = () => edit(w.path, c.checked);
    row.insertBefore(c, label);
  }
  return row;
}

async function buildPanel() {
  const st = await (await fetch("/api/state")).json();
  values = st.values;
  const root = $("controls");
  root.innerHTML = "";
  for (const [section, widgets] of Object.entries(st.schema)) {
    const h = document.createElement("h3");
    h.textContent = section;
    root.appendChild(h);
    for (const w of widgets) root.appendChild(widgetRow(w));
  }
}

let lastFrame = -1;
async function poll() {
  try {
    const s = await (await fetch("/api/status")).json();
    $("status").textContent =
      `pass ${s.passes} - ${s.total_spp} spp - last pass ${s.last_pass_ms} ms`;
    $("device").textContent = `device: ${s.device} - ${s.width}x${s.height}`;
    $("error").textContent = s.error || "";
    if (s.frame_version !== lastFrame) {
      lastFrame = s.frame_version;
      $("frame").src = "/frame.png?v=" + s.frame_version;
    }
  } catch (e) { $("error").textContent = "server unreachable"; }
  setTimeout(poll, 500);
}

$("render").onclick = () => post("/api/render");
$("continuous").onchange = e => post("/api/continuous", {on: e.target.checked});
$("save").onclick = () => post("/api/save", {path: $("savepath").value});

buildPanel();
poll();
</script>
</body>
</html>
"""
