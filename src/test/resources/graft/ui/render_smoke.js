const fs = require('fs');
const html = fs.readFileSync(process.argv[2] || 'src/main/resources/graft/ui/index.html', 'utf8');
// extract the chart module: analysis + palette + renderers + renderChartArea
const start = html.indexOf('// CHART-ANALYSIS-BEGIN');
const end = html.indexOf('// ── ask flow');
const src = html.slice(start, end);

// minimal DOM shim
function FakeEl(tag) {
  this.tag = tag; this.attrs = {}; this.children = []; this.classList = {
    toggle: () => {}, add: () => {}, remove: () => {} };
  this.textContent = '';
}
FakeEl.prototype.setAttribute = function (k, v) { this.attrs[k] = v; };
FakeEl.prototype.append = function (...kids) { this.children.push(...kids); };
FakeEl.prototype.replaceChildren = function (...kids) { this.children = kids; };
FakeEl.prototype.querySelectorAll = function () { return this.children.filter(c => c.tag === 'button'); };
const document = { createElementNS: (ns, t) => new FakeEl(t), createElement: t => new FakeEl(t) };
function el(tag, attrs, ...kids) {
  const n = new FakeEl(tag);
  Object.assign(n.attrs, attrs || {});
  for (const k of kids) { if (typeof k === 'string') n.textContent += k; else n.append(k); }
  return n;
}
const fn = new Function('document', 'el', src +
  '; return {analyzeDataForChart, svgBarChart, svgLineChart, svgPieChart, renderChartArea};');
const m = fn(document, el);

function walk(n, pred, out = []) {
  if (pred(n)) out.push(n);
  (n.children || []).forEach(c => { if (c instanceof FakeEl) walk(c, pred, out); });
  return out;
}
let fails = 0;
function check(name, cond) { console.log((cond ? 'OK   ' : 'FAIL ') + name); if (!cond) fails++; }

// time-series result → line default with 2 polylines (2 value cols)
const envT = {columns: ['month', 'rev', 'cost'],
  rows: [['2024-01', 10, 4], ['2024-02', 12, 5], ['2024-03', 9, 3]],
  column_types: ['str', 'int', 'int']};
const areaT = m.renderChartArea(envT);
const btnsT = walk(areaT, n => n.tag === 'button').map(b => b.textContent);
check('multi-value time result offers bar/line buttons', btnsT.join(',') === 'bar,line');
const polys = walk(areaT, n => n.tag === 'polyline');
check('bar default for multi-value (no polylines yet)', polys.length === 0);
const rects = walk(areaT, n => n.tag === 'rect');
check('grouped bars: 3 rows x 2 cols = 6 rects', rects.length === 6);

// single-value time series → line default
const envL = {columns: ['month', 'rev'], rows: [['2024-01', 10], ['2024-02', 12], ['2024-03', 9]]};
const areaL = m.renderChartArea(envL);
const polysL = walk(areaL, n => n.tag === 'polyline');
check('time single-value defaults to line (1 polyline)', polysL.length === 1);
check('polyline has 3 points', polysL.length && polysL[0].attrs.points.split(' ').length === 3);
const circles = walk(areaL, n => n.tag === 'circle');
check('line has 3 point markers', circles.length === 3);

// few-category single value → pie available; render pie explicitly
const envP = {columns: ['region', 'total'], rows: [['EU', 5], ['US', 7], ['APAC', 3]]};
const a = m.analyzeDataForChart(envP.columns, envP.rows);
check('few-cat types', a.suggestedTypes.join(',') === 'bar,pie,doughnut');
const pie = m.svgPieChart(envP, a, false);
check('pie renders 3 wedge paths', walk(pie, n => n.tag === 'path').length === 3);
const legend = walk(pie, n => n.tag === 'text').map(t => t.textContent);
check('pie legend carries values+pct', legend.some(t => t.includes('EU') && t.includes('%')));
const dough = m.svgPieChart(envP, a, true);
check('doughnut wedge paths have inner arc', walk(dough, n => n.tag === 'path')
  .every(p => (p.attrs.d.match(/A /g) || []).length === 2));

// not chartable
const areaN = m.renderChartArea({columns: ['a'], rows: [['x'], ['y']]});
check('non-numeric result explains instead of charting',
  walk(areaN, n => (n.textContent || '').includes('No numeric data')).length === 1);

process.exit(fails ? 1 : 0);
