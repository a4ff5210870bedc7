package graft.serve

/** The browser front door — counterpart of the reference's Streamlit
  * panel app (`frontend/app.py`: five workflow columns driving the
  * FastAPI routes), re-expressed as a single embedded HTML page served
  * by [[GraftServer]] at `GET /`. No build step, no framework, no
  * assets, zero egress: one self-contained document whose JavaScript
  * drives exactly the JSON routes the API already exposes (create
  * table → upload → parse → index → search → manage), so the UI can
  * never drift ahead of the serving surface it fronts. The page is the
  * VIEW plane only — every action is a `fetch` against a route the
  * ServeSpec already pins, and rendering is route-shaped (tables of
  * rows, hit lists with `_score`).
  */
object WebUi {

  /** Panel id → the API routes it drives (pinned by WebUiSpec so a
    * dropped panel or renamed route fails the build, and an honest
    * machine-readable statement of UI coverage). */
  val PanelRoutes: Map[String, Seq[String]] = Map(
    "panel-tables" -> Seq("/create_tables", "/tables", "/select_all",
      "/unique-filepath"),
    "panel-upload" -> Seq("/upload", "/parse_pdf_by_path",
      "/batch_parse_by_folder", "/insert_from_pickle"),
    "panel-index" -> Seq("/index/document", "/indices"),
    "panel-search" -> Seq("/search", "/document"),
  )

  val html: String = s"""<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Graft — Auto VectorDB</title>
<style>
  :root { --b:#1f6feb; --bg:#0d1117; --fg:#e6edf3; --card:#161b22;
          --mut:#8b949e; --ok:#2ea043; --err:#f85149; }
  body { font-family: system-ui, sans-serif; margin:0; background:var(--bg);
         color:var(--fg); }
  header { padding:16px 24px; border-bottom:1px solid #30363d; }
  header h1 { margin:0; font-size:20px; color:var(--b); }
  main { display:grid; grid-template-columns:repeat(4,1fr); gap:12px;
         padding:16px 24px; align-items:start; }
  section { background:var(--card); border:1px solid #30363d;
            border-radius:8px; padding:12px; }
  h2 { font-size:14px; margin:0 0 8px; color:var(--b); }
  input, button, textarea { width:100%; box-sizing:border-box; margin:3px 0;
    background:#0d1117; color:var(--fg); border:1px solid #30363d;
    border-radius:6px; padding:6px 8px; font-size:13px; }
  button { background:var(--b); border:none; cursor:pointer; font-weight:600; }
  button:hover { filter:brightness(1.15); }
  pre { background:#0d1117; border:1px solid #30363d; border-radius:6px;
        padding:8px; font-size:11px; max-height:240px; overflow:auto;
        white-space:pre-wrap; word-break:break-all; }
  .hit { border-bottom:1px solid #30363d; padding:6px 0; font-size:12px; }
  .hit .score { color:var(--ok); font-weight:600; }
  .mut { color:var(--mut); font-size:11px; }
</style>
</head>
<body>
<header><h1>Graft — Auto VectorDB</h1>
<span class="mut">create table → upload → parse → index → search
 (every panel drives the JSON API this server also exposes)</span></header>
<main>

<section id="panel-tables">
  <h2>1 · Tables</h2>
  <input id="tname" placeholder="table name">
  <button onclick="api('POST','/create_tables',{table_name:v('tname')})">Create table</button>
  <button onclick="api('GET','/tables')">List tables</button>
  <button onclick="api('GET','/select_all?table_name='+v('tname')+'&limit=10')">Preview rows</button>
  <button onclick="api('GET','/unique-filepath/'+v('tname'))">Distinct filepaths</button>
  <button onclick="api('DELETE','/tables/'+v('tname'))">Drop table</button>
  <pre id="out-tables" class="out"></pre>
</section>

<section id="panel-upload">
  <h2>2 · Upload &amp; parse</h2>
  <input id="file" type="file">
  <button onclick="upload()">Upload file (/upload)</button>
  <input id="ppath" placeholder="uploaded path to parse">
  <button onclick="api('POST','/parse_pdf_by_path',{file_path:v('ppath'),table_name:v('tname')})">Parse PDF (/parse_pdf_by_path)</button>
  <input id="pfolder" placeholder="folder to batch-parse">
  <button onclick="api('POST','/batch_parse_by_folder',{folder_path:v('pfolder'),table_name:v('tname')})">Batch parse (/batch_parse_by_folder)</button>
  <button onclick="api('POST','/insert_from_pickle',{table_name:v('tname')})">Insert parsed → table (/insert_from_pickle)</button>
  <pre id="out-upload" class="out"></pre>
</section>

<section id="panel-index">
  <h2>3 · Index</h2>
  <input id="iname" placeholder="index name">
  <input id="hfp" placeholder="hashed_filepath (from panel 1)">
  <button onclick="api('POST','/index/document',{index_name:v('iname'),table_name:v('tname'),hashed_filepath:v('hfp')})">Index document</button>
  <button onclick="api('GET','/indices')">List indices</button>
  <button onclick="api('DELETE','/indices/'+v('iname'))">Delete index</button>
  <pre id="out-index" class="out"></pre>
</section>

<section id="panel-search">
  <h2>4 · Search</h2>
  <input id="q" placeholder="query text">
  <input id="k" value="5" placeholder="size">
  <button onclick="search()">Hybrid search (/search)</button>
  <button onclick="api('GET','/document/'+v('iname')+'/'+v('hfp'))">Fetch document pages</button>
  <div id="hits"></div>
  <pre id="out-search" class="out"></pre>
</section>

</main>
<script>
function v(id){ return document.getElementById(id).value.trim(); }
function panelOut(panel){ return document.querySelector('#'+panel+' .out'); }
function show(el, code, body){
  el.textContent = 'HTTP ' + code + '\\n' + body;
  el.style.borderColor = code < 300 ? 'var(--ok)' : 'var(--err)';
}
async function api(method, path, jsonBody){
  const panel = event.target.closest('section').id;
  const el = panelOut(panel);
  try {
    const r = await fetch(path, jsonBody === undefined
      ? {method}
      : {method, headers:{'Content-Type':'application/json'},
         body: JSON.stringify(jsonBody)});
    const t = await r.text();
    show(el, r.status, t);
    return JSON.parse(t);
  } catch (e) { show(el, 0, String(e)); }
}
async function upload(){
  const f = document.getElementById('file').files[0];
  const el = panelOut('panel-upload');
  if (!f) { show(el, 0, 'choose a file first'); return; }
  const fd = new FormData();
  fd.append('file', f, f.name);
  const r = await fetch('/upload', {method:'POST', body:fd});
  show(el, r.status, await r.text());
}
async function search(){
  const res = await api('POST','/search',
    {index_name:v('iname'), query_text:v('q'),
     size:parseInt(v('k'))||5, min_score:0.1});
  const hits = document.getElementById('hits');
  hits.innerHTML = '';
  if (res && res.results) for (const h of res.results) {
    const d = document.createElement('div');
    d.className = 'hit';
    d.innerHTML = '<span class="score">' + h._score + '</span> · page '
      + (h.page ?? '?') + ' · ' + (h.filename ?? '')
      + '<div class="mut">' + String(h.page_content ?? '')
        .slice(0, 240).replace(/</g,'&lt;') + '</div>';
    hits.appendChild(d);
  }
}
</script>
</body>
</html>
"""
}
