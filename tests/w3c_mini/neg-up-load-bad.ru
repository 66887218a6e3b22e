PREFIX : <http://example/>
LOAD <http://example/doc> INTO <http://example/g>
