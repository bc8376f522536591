function [wfn, pot, config] = load_run(run_dir, state)
% LOAD_RUN Load a solver run's outputs for analysis.
%   [WFN, POT, CONFIG] = LOAD_RUN(RUN_DIR, STATE) reads the run's YAML
%   config (grid geometry), the sparse CSV wavefunction_{STATE}.csv and
%   potential.csv (i,j,k,data records) and returns dense 3D arrays.
%
%   Counterpart of the reference's analysis/matlab/load_plain.m:1-153.
%   Example rendering:
%       [w, v] = load_run('output/develop_2026-...', 0);
%       mid = ceil(size(w,3)/2);
%       pcolor(squeeze(w(:,:,mid))'); shading interp; colorbar;
%       figure; isosurface(w.^2, max(w(:).^2)/10); axis equal;

if nargin < 2
    state = 0;
end

% --- config (minimal YAML scrape: grid size + dn) ---
config = struct();
listing = dir(fullfile(run_dir, '*.yaml'));
for i = 1:numel(listing)
    name = listing(i).name;
    if contains(name, 'observables') || contains(name, 'wavefunction') ...
            || contains(name, 'potential')
        continue
    end
    txt = fileread(fullfile(run_dir, name));
    config.dn = str2double(regexp(txt, 'dn:\s*([0-9eE+\-\.]+)', 'tokens', 'once'));
    config.dt = str2double(regexp(txt, 'dt:\s*([0-9eE+\-\.]+)', 'tokens', 'once'));
    break
end

% --- sparse CSV → dense array ---
wfn = read_plain(fullfile(run_dir, sprintf('wavefunction_%d.csv', state)));
pot_file = fullfile(run_dir, 'potential.csv');
if exist(pot_file, 'file')
    pot = read_plain(pot_file);
else
    pot = [];
end
end

function arr = read_plain(path)
raw = readmatrix(path);
dims = max(raw(:, 1:3), [], 1) + 1;
arr = zeros(dims);
idx = sub2ind(dims, raw(:,1) + 1, raw(:,2) + 1, raw(:,3) + 1);
arr(idx) = raw(:, 4);
end
