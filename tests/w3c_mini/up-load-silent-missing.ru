PREFIX : <http://example/>
LOAD SILENT <file:///nonexistent/missing.nt>
